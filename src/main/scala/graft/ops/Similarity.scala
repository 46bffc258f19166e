package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k for a bounded query set (the exact
  * answer; O(|Q| * N) — |Q| kept small and broadcast). Scale path:
  * sign-random-projection LSH buckets so candidate generation is a bucket
  * equi-join instead of a cross join.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** aggregate(zip_with(a,b,*), 0.0, +) — codegen'd dot product, no explode.
    * Deterministic left-fold order -> reproducible float math. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Exact top-k cosine neighbors for queries (vec_id < nQueries).
    * The query side is tiny -> broadcast; the corpus side streams, so the
    * plan is a single pass over N rows regardless of cluster size. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 20, k: Int = 10): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val joined = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      // parts-per-million integer score: exact cross-engine comparison
      .withColumn("cos_ppm",
        round(dot(col("qe"), col("embedding")) /
          (norm(col("qe")) * norm(col("embedding"))) * 1e6).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_ppm").desc, col("vec_id"))
    joined
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos_ppm"), col("rank"))
  }

  /** Deterministic ±1 random-hyperplane table: weight(p, d) from the top
    * bit of md5("p|d") — reproducible in any engine, no RNG state. */
  def planes(spark: org.apache.spark.sql.SparkSession, nPlanes: Int, dim: Int): DataFrame = {
    val p = spark.range(nPlanes).select(col("id").as("p"))
    val d = spark.range(dim).select(col("id").as("d"))
    p.crossJoin(d).withColumn("w",
      when(substring(md5(concat(col("p").cast("string"), lit("|"),
        col("d").cast("string"))), 1, 1) >= "8", 1.0)
        .otherwise(-1.0))
  }

  /** IVF coarse quantization (the other scale path besides LSH): assign
    * every vector to its nearest of `nCells` centroids; a query then scans
    * only its cell (1/nCells of the corpus per probe). The codebook is the
    * deterministic prefix of the corpus (vec_id < nCells) — a k-means
    * refinement slots in without changing the dataflow. */
  def ivfAssign(emb: DataFrame, nCells: Int = 16): DataFrame = {
    val centroids = broadcast(emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("ce")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cell"))
    emb.crossJoin(centroids)
      .withColumn("sim",
        dot(col("embedding"), col("ce")) / (norm(col("embedding")) * norm(col("ce"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"))
  }

  /** IVF top-k: probe only the query's own cell. Exactness degrades to
    * recall@cell (tested against brute force on clustered fixtures);
    * nProbes > 1 would union the next-nearest cells. */
  def ivfTopK(emb: DataFrame, assignments: DataFrame, nQueries: Int = 20,
      k: Int = 10): DataFrame = {
    val withCell = emb.join(assignments, "vec_id")
    val q = broadcast(withCell.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cell")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_ppm").desc, col("vec_id"))
    withCell.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_ppm",
        round(dot(col("qe"), col("embedding")) /
          (norm(col("qe")) * norm(col("embedding"))) * 1e6).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos_ppm"), col("rank"))
  }

  /** Sign-random-projection LSH bucket per vector: nPlanes sign bits.
    * Vectors in the same bucket are ANN candidates (query cost becomes an
    * equi-join by bucket instead of a scan). */
  def lshBuckets(emb: DataFrame, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val spark = emb.sparkSession
    val v = emb.select(col("vec_id"),
      posexplode(asDouble(col("embedding"))).as(Seq("d", "x")))
    val proj = v
      .join(broadcast(planes(spark, nPlanes, dim)), Seq("d"))
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("w") * col("x")).as("s"))
      .withColumn("bit", when(col("s") > 0, "1").otherwise("0"))
    proj
      .groupBy("vec_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("p"), col("bit")))),
        s => s.getField("bit")), "").as("bucket"))
      .select(col("vec_id"), col("bucket"))
  }
}
