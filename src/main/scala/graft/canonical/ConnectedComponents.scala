package graft.canonical

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-only connected components via alternating large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the cross-conversation entity-resolution primitive
  * demanded by the north rule. GraphFrames/GraphX are deliberately not
  * used: the loop is plain Catalyst joins/aggregations, so AQE handles
  * skew-splitting of hot labels, and `localCheckpoint` cuts the growing
  * lineage every iteration (SURVEY.md §4.3).
  *
  * Input: undirected edges as (src: long, dst: long). Output: one row per
  * node, (id, component) where component = min node id of its component.
  *
  * Scale notes: each round is one shuffle by node id; power-law degree
  * (hot entities) concentrates in the groupBy-min, which is safe (partial
  * aggregation combines map-side), and in the neighbor join, which AQE
  * skew-join splits. Convergence is O(log n) rounds.
  */
object ConnectedComponents {

  /** Large-star: connect every strictly-larger neighbor of u to
    * min(Γ(u) ∪ {u}). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
    val mins = nbrs
      .groupBy("u")
      .agg(least(min("v"), first("u")).as("m"))
    nbrs.filter(col("v") > col("u"))
      .join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: orient each edge at its larger endpoint u; connect u and
    * all its smaller neighbors to the minimum of those neighbors. The
    * (u -> m) edge is what keeps u attached — omitting it disconnects the
    * graph. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("src"), col("dst")).as("u"),
      least(col("src"), col("dst")).as("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    val reattached = oriented
      .join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
    val self = mins.select(col("u").as("src"), col("m").as("dst"))
    reattached.union(self).distinct()
  }

  /** Run to fixpoint (or maxIter). Returns (id, component). */
  def run(edges0: DataFrame, maxIter: Int = 25): DataFrame = {
    // normalize: undirected, no self-loops, min-first orientation
    // LAZY localCheckpoints throughout the fixpoint: the signature
    // aggregate right below is the round's one action and it scans every
    // partition, so it both tests convergence AND materializes the
    // checkpoint in the SAME job — the previous eager form paid two
    // driver-synchronized jobs per round (checkpoint, then sig), doubling
    // the per-round overhead that dominates CC wall time on small/medium
    // graphs (guide §1.2: the per-round work here is tiny; the rounds'
    // scheduling is the cost).
    var edges = edges0
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    // fixpoint test on a cheap order-insensitive checksum + count; the
    // previous round's signature is carried forward (one aggregate per
    // round, not two). 64-bit xxhash64 keeps collision odds (a premature
    // "converged") negligible.
    def sig(df: DataFrame) = df.agg(
      count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).collect()(0)
    var prevSig = sig(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges))
        .select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .distinct()
        .localCheckpoint(false)
      val nextSig = sig(next)
      converged = nextSig == prevSig
      prevSig = nextSig
      edges = next
      iter += 1
    }
    // Star contraction converges in O(log n) rounds; hitting the cap means
    // component labels may still be wrong — fail loudly, never silently.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations")
    // After convergence every edge is (member -> component min); add the
    // representative itself and any isolated nodes are the caller's concern
    // (they form singleton components).
    val members = edges.select(col("dst").as("id"), col("src").as("component"))
      .union(edges.select(col("src").as("id"), col("src").as("component")))
      .groupBy("id").agg(min("component").as("component"))
    members
  }

  /** Components over a node universe: nodes absent from any edge become
    * singleton components (component = own id). */
  def runWithNodes(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val comp = run(edges, maxIter)
    nodes.select(col("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
