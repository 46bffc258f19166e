package graft.canonical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k without a one-task-per-group global sort
  * (VERDICT r05 #7: brute-force ANN and the name-word dashboard funneled
  * each group's FULL row set through a single window task).
  *
  * Below the gate (plan-statistics estimate) the classic single
  * partitioned row_number window is cheapest — one shuffle, and the
  * sandbox-scale bench keeps its exact plan. Above the gate a two-phase
  * form runs: phase 1 ranks within (group, input partition) — |groups| x
  * |partitions| concurrent sort groups instead of |groups| — and keeps at
  * most k rows per (group, partition); phase 2 ranks the surviving
  * <= partitions * k rows per group. Both phases are plain codegen window
  * row_numbers over the SAME total order, so the output is exactly the
  * single-window top-k: every group-global top-k row is, within its own
  * partition, preceded by fewer than k rows of its group, hence survives
  * phase 1; phase 2 then assigns identical ranks (the order is total).
  *
  * `order` must be a TOTAL order within each group (both call sites
  * tiebreak to totality) — the same requirement the single-window form
  * already had for determinism.
  */
object TopK {

  /** Gate in bytes; overridable for tests via -Dgraft.topk.twoPhaseMinBytes. */
  def twoPhaseMinBytes: Long =
    sys.props.get("graft.topk.twoPhaseMinBytes").map(_.toLong)
      .getOrElse(256L << 20)

  /** Append `rkCol` (long, 1-based) and keep rows with rank <= k. */
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int, rkCol: String): DataFrame = {
    require(k >= 1, s"TopK.perGroup: k must be >= 1, got $k")
    val big = df.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(twoPhaseMinBytes)
    val pruned =
      if (!big) df
      else {
        // spark_partition_id materialized as an attribute first: a
        // nondeterministic expression is legal in a Project but not in a
        // window partition spec. Which partition a row lands in does not
        // affect the result (any assignment preserves the exactness
        // argument above).
        val wp = Window.partitionBy((groupCols :+ "_pp").map(col): _*)
          .orderBy(order: _*)
        df.withColumn("_pp", spark_partition_id())
          .withColumn("_prk", row_number().over(wp))
          .filter(col("_prk") <= k)
          .drop("_pp", "_prk")
      }
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    pruned.withColumn(rkCol, row_number().over(w).cast("long"))
      .filter(col(rkCol) <= k)
  }
}
