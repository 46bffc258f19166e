package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators: deterministic sampling and training-mix
  * statistics.
  *
  * Sampling a 100 TB corpus must be reproducible and shuffle-free: a
  * per-row hash threshold (no RNG seed state, no global sort, no
  * count-based quota) keeps the same document across reruns, cluster
  * sizes, and engines. md5-hex keys make the decision portable to the
  * DuckDB oracle bit-for-bit.
  */
object Curation {

  /** Deterministic stratified sampling: keep a row iff the first two hex
    * chars of md5("smp|" || id) fall below its stratum's threshold — a
    * pure per-row filter, no shuffle, trivially parallel at any scale.
    * `rates` maps stratum value -> two-hex-char threshold ("40" = 64/256
    * = 25 %, "80" = 50 %); `defaultRate` applies to unlisted strata
    * ("zz" sorts above every hex digit = keep all). Emits the surviving
    * rows plus their `sample_key` for auditability. */
  def stratifiedSample(rows: DataFrame, stratumCol: String,
      rates: Seq[(String, String)], defaultRate: String,
      idCol: String = "doc_id"): DataFrame = {
    val thresh = rates.foldRight(lit(defaultRate): org.apache.spark.sql.Column) {
      case ((stratum, rate), acc) =>
        when(col(stratumCol) === stratum, lit(rate)).otherwise(acc)
    }
    rows
      .withColumn("sample_key",
        substring(md5(concat(lit("smp|"), col(idCol).cast("string"))), 1, 2))
      .filter(col("sample_key") < thresh)
  }

  /** Training-mix statistics: per stratum, document count, token count,
    * and each stratum's parts-per-million share of total tokens — the
    * summary a mixture-weighting step consumes. Two map-side-combinable
    * aggregations; the grand total is a single broadcast row (bounded by
    * construction, never corpus-scaling). */
  def mixStats(rows: DataFrame, stratumCol: String,
      tokCol: String): DataFrame = {
    val per = rows.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("_tot"))
    per.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("_tot") * 1e6)
          .cast("long").as("token_share_ppm"))
  }
}
