package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the emitted KG beyond degree counts — the
  * second thing a KG consumer computes (the reference exposes its graph
  * to networkx consumers via the Neo4j export; here the analytic runs
  * IN the engine, on the same typed edge table).
  *
  * All arithmetic is fixed-point integer so every engine agrees exactly:
  * floats would make the result depend on partition-summation order. */
object Analytics {

  /** Deterministic integer PageRank over a (src_id, dst_id) edge list
    * (multi-edges count — a repeated triple is a stronger link, and the
    * multigraph form needs no pre-aggregation pass).
    *
    * Fixed-point micro-units: rank starts at 1e6; one iteration is
    * r' = 150000 + (85 * Σ_in floor(r_src / out_deg)) div 100 — floor
    * division and long sums only, so the result is bit-identical at any
    * partitioning (sums of longs are associative; no float mass ever
    * crosses a shuffle). Dangling mass is dropped (the standard
    * simplification — ranking order, not a stochastic-matrix invariant,
    * is the product here).
    *
    * Scale shape: per iteration one key-partitioned join of edges with
    * the rank table + one groupBy(dst) aggregate (map-side combinable);
    * the rank table is localCheckpointed each round so iteration N+1
    * never re-derives round N (the ConnectedComponents fixpoint
    * pattern). Out-degrees are computed once. */
  def pageRank(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    val e = edges.select(col("src_id"), col("dst_id"))
    val nodes = e.select(col("src_id").as("node_id"))
      .union(e.select(col("dst_id").as("node_id"))).distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("src_id")).agg(count(lit(1)).as("deg"))
    // loop-invariant work hoisted OUT of the iteration (guide §2.4): the
    // out-degree join never changes across rounds, and a (src, dst) edge
    // repeated m times contributes exactly m * floor(pr_src / deg) — so
    // multiplicity pre-aggregates once and every round joins the smaller
    // distinct-pair table instead of the raw multigraph. Values are
    // bit-identical (m copies of the same floor term sum to m * term).
    val em = e.groupBy(col("src_id"), col("dst_id")).agg(count(lit(1)).as("m"))
      .join(outDeg, Seq("src_id"))
      .localCheckpoint()
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      val inflow = em
        .join(pr.withColumnRenamed("node_id", "src_id"), Seq("src_id"))
        .select(col("dst_id").as("node_id"),
          (col("m") * expr("pr div deg")).as("c"))
        .groupBy(col("node_id")).agg(sum(col("c")).as("inflow"))
      pr = nodes.join(inflow, Seq("node_id"), "left")
        .select(col("node_id"),
          (lit(150000L) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("pr"))
        // LAZY: each round's table is consumed exactly once (by the next
        // round's join, or by the final consumer), so the whole fixpoint
        // runs as ONE job of chained shuffle stages instead of one
        // driver-synchronized job per round; the checkpoint mark still
        // truncates lineage for any re-execution. Plan growth is linear
        // in iters (5) — far below the planning-time danger zone.
        .localCheckpoint(false)
    }
    pr
  }
}
