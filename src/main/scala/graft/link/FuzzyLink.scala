package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity linking: map noisy surface forms onto a canonical
  * dictionary — the north star's profiled hot stage ("batched per-partition
  * mention detection and entity-link scoring via broadcast dictionary +
  * trigram/MinHash candidate blocking").
  *
  * Shape: exact matches short-circuit via a broadcast semi-join (the
  * reference's dict lookup, call_graph.py:729-732); the fuzzy remainder is
  * blocked by MinHash bands over character trigrams (candidate pairs
  * become an equi-join on band buckets instead of a surface × dictionary
  * cross join), then scored by exact trigram Jaccard and resolved to the
  * best candidate with a total deterministic tiebreak (score desc, name
  * asc). Everything is md5-based column expressions — codegen'd, and
  * reproducible in the DuckDB oracle.
  */
object FuzzyLink {

  /** Trigrams over an already-materialized padded-name COLUMN ("^name$").
    * The lambda must reference a bound attribute — a non-attribute subtree
    * re-evaluates once per element inside a higher-order function (see
    * Dedup.shinglesOfWords). Empty names yield an empty set (Spark's
    * `sequence(1, 0)` would otherwise produce a bogus descending range
    * where the DuckDB oracle's `range()` is empty). */
  def trigramsOfPadded(padded: Column): Column =
    when(length(padded) >= 3,
      array_distinct(transform(
        sequence(lit(1), length(padded) - 2),
        i => padded.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Convenience per-row form for small inputs (candidate scoring). */
  def charTrigramsCol(name: Column): Column =
    trigramsOfPadded(concat(lit("^"), name, lit("$")))

  /** MinHash band buckets over char trigrams (k seeds, rowsPerBand).
    * Signatures via explode + groupBy-min aggregates (one shuffle,
    * map-side combinable) — the corpus-scale shape of Dedup
    * .minhashSignatures; names with no trigrams get no bucket (no
    * candidates), which matches the oracle's empty-set semantics. */
  def nameBuckets(df: DataFrame, nameCol: String, k: Int = 8,
      rowsPerBand: Int = 2): DataFrame = {
    val tg = df
      .select(col(nameCol), concat(lit("^"), col(nameCol), lit("$")).as("_p"))
      .select(col(nameCol), explode(trigramsOfPadded(col("_p"))).as("_tg"))
    val sigs = (0 until k).map(s =>
      min(md5(concat(lit(s"$s|"), col("_tg")))).as(s"m$s"))
    val withSig = tg.groupBy(col(nameCol)).agg(sigs.head, sigs.tail: _*)
    val nBands = k / rowsPerBand
    // single pass over the signatures (see Dedup.minhashBuckets)
    val bandStructs = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).cast("long").as("band"), md5(concat(parts: _*)).as("bucket"))
    }
    withSig
      .select(col(nameCol), inline(array(bandStructs: _*)))
      .select(col(nameCol), col("band"), col("bucket"))
  }

  /** Link surfaces to dictionary names.
    * Output: (surface, matched, score_ppm, method ∈ {exact, fuzzy}) —
    * one row per DISTINCT surface. Surfaces with no candidate above
    * `minScorePpm` are dropped (the caller can left-join to keep
    * misses). */
  def link(surfaces: DataFrame, dict: DataFrame, surfaceCol: String = "surface",
      dictCol: String = "name", minScorePpm: Long = 300000L): DataFrame = {
    // The dictionary is the canonical entity vocabulary — it scales with
    // the corpus, so the exact-match semi/anti joins are size-gated
    // (Joins): broadcast hint only while the side provably fits; above
    // the gate AQE plans from runtime sizes. The gated join shape is only
    // skew-free when each surface appears once, so enforce distinctness
    // here rather than trusting callers (a duplicated hot surface with an
    // over-gate dictionary would otherwise hit an unsalted shuffle join
    // on the hot key — VERDICT r03 advice); for already-distinct inputs
    // this is one shuffle of the surface VOCABULARY, not the corpus.
    val surf = surfaces.dropDuplicates(surfaceCol)
    val dictAsSurface = dict.select(col(dictCol).as(surfaceCol))
    val exact = graft.canonical.Joins.semiDistinct(surf, dictAsSurface, surfaceCol)
      .select(col(surfaceCol), col(surfaceCol).as("matched"),
        lit(1000000L).as("score_ppm"), lit("exact").as("method"))

    val misses = graft.canonical.Joins.antiDistinct(surf, dictAsSurface, surfaceCol)

    val sb = nameBuckets(misses, surfaceCol)
      .withColumnRenamed(surfaceCol, "surface_")
    val db = nameBuckets(dict, dictCol).withColumnRenamed(dictCol, "cand")
    val candidates = sb.join(db, Seq("band", "bucket"))
      .select(col("surface_"), col("cand")).distinct()

    val scored = candidates
      .withColumn("tg_s", charTrigramsCol(col("surface_")))
      .withColumn("tg_c", charTrigramsCol(col("cand")))
      .withColumn("inter", size(array_intersect(col("tg_s"), col("tg_c"))).cast("double"))
      .withColumn("score_ppm",
        round(col("inter") /
          (size(col("tg_s")) + size(col("tg_c")) - col("inter")).cast("double") * 1e6)
          .cast("long"))
      .filter(col("score_ppm") >= minScorePpm)

    val w = Window.partitionBy("surface_")
      .orderBy(col("score_ppm").desc, col("cand"))
    val best = scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("surface_").as(surfaceCol), col("cand").as("matched"),
        col("score_ppm"), lit("fuzzy").as("method"))

    exact.unionByName(best)
  }
}
