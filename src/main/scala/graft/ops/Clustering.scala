package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic clustering side-car (reference semantic_clustering.py:37-102 +
  * cluster_function_edges, knowledge_graph.py:1201-1218), as one verifiable
  * Lloyd iteration of k-means over the embedding table.
  *
  * All arithmetic is integer after quantizing the float embeddings to
  * micro-units, so cluster assignments are bit-identical across engines
  * (the DuckDB oracle reproduces them exactly) and across partitionings —
  * float summation order can never flip an argmin.
  *
  * Scale shape: centroids are k rows (broadcast); assignment is a
  * map-side-combinable `min(struct(d2, cid))` aggregate, not a window;
  * centroid means are a (k x dims)-group aggregate. One Lloyd round = two
  * shuffles on vec_id + one tiny aggregate, independent of corpus size.
  */
object Clustering {

  /** Quantize an embedding to integer micro-units (round(x * 1e6)). */
  def quantized(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * 1e6).cast("long"))
        .as("xq"))

  /** Integer squared L2 distance between two quantized vectors. */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Nearest centroid per vector: argmin over (d2, cid) via a struct-min
    * aggregate (partial-aggregation friendly; no per-vector sort). */
  private def assign(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .withColumn("d2", dist2(col("xq"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).getField("cid").as("cluster"))

  /** One full Lloyd iteration: seed centroids = vectors with vec_id in
    * [seedFrom, seedFrom + k), assign, recompute integer-rounded means,
    * reassign. Output: (vec_id, cluster), cluster in [0, k).
    * Distinct `seedFrom` values give independent ensemble members
    * (reference runs clustering more than once and joins the results,
    * semantic_clustering.py / SURVEY J9 — see [[ensemble]]). */
  def lloydStep(emb: DataFrame, k: Int = 8, seedFrom: Int = 0): DataFrame = {
    val q = quantized(emb)
    val c0 = q.filter(col("vec_id") >= seedFrom && col("vec_id") < seedFrom + k)
      .select((col("vec_id") - seedFrom).as("cid"), col("xq").as("cq"))
    // Seeding assumes dense vec_ids covering the seed window; sparse ids
    // would silently yield < k centroids (an EMPTY c0 makes assign return
    // an empty frame with no error) — fail loudly instead. The count is a
    // pushed-down vec_id range parquet scan, not a full pass.
    val nSeeds = c0.count()
    require(nSeeds == k,
      s"lloydStep: expected $k seed centroids (vec_id in [$seedFrom," +
        s"${seedFrom + k})), found $nSeeds — vec_ids must be dense")
    val a0 = assign(q, c0)
    val means = q.join(a0, Seq("vec_id"))
      .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(round(avg(col("v"))).cast("long").as("cv"))
    val c1 = means.groupBy(col("cluster").as("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
        s => s.getField("cv")).as("cq"))
    assign(q, c1)
  }

  /** Full Lloyd loop: `iters` rounds of (means, assign) after the seeded
    * first assignment (iters=1 == [[lloydStep]]). Each round's assignment
    * is localCheckpointed — (vec_id, cluster) is two longs, the narrow
    * shape localCheckpoint is right for — so round N+1's plan never
    * re-derives round N (the fixpoint-iteration pattern of
    * ConnectedComponents; a growing lineage would re-execute every prior
    * round per action and stop scaling). Cost per round: one quantized
    * pass + two vec_id shuffles + a (k x dims) aggregate — independent of
    * iteration count, linear in corpus size. */
  def lloyd(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"lloyd: iters must be >= 1, got $iters")
    val q = quantized(emb).localCheckpoint()
    val c0 = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("xq").as("cq"))
    val nSeeds = c0.count()
    require(nSeeds == k,
      s"lloyd: expected $k seed centroids (vec_id in [0,$k)), found $nSeeds")
    var a = assign(q, c0).localCheckpoint()
    for (_ <- 1 to iters) {
      val means = q.join(a, Seq("vec_id"))
        .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(round(avg(col("v"))).cast("long").as("cv"))
      val c = means.groupBy(col("cluster").as("cid"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          s => s.getField("cv")).as("cq"))
      a = assign(q, c).localCheckpoint()
    }
    a
  }

  /** Total integer SSE of an assignment against its own centroids —
    * the convergence metric (Lloyd never increases it). */
  def sse(emb: DataFrame, assignment: DataFrame): Long = {
    val q = quantized(emb)
    val withA = q.join(assignment, Seq("vec_id"))
    val cents = withA
      .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(round(avg(col("v"))).cast("long").as("cv"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
        s => s.getField("cv")).as("cq"))
    withA.join(cents, Seq("cluster"))
      .select(dist2(col("xq"), col("cq")).as("d2"))
      .agg(sum(col("d2"))).collect()(0).getLong(0)
  }

  /** Ensemble of two independently-seeded clusterings joined per vector
    * (the reference's ensemble cluster join, SURVEY J9): each member is a
    * full Lloyd iteration with a disjoint seed window; the equi-join on
    * vec_id (both sides distinct per key — no skew possible) emits the
    * co-assignment, whose distinct pairs are the consensus groups. */
  def ensemble(emb: DataFrame, k: Int = 8): DataFrame = {
    val a = lloydStep(emb, k, seedFrom = 0)
      .withColumnRenamed("cluster", "cluster_a")
    val b = lloydStep(emb, k, seedFrom = k)
      .withColumnRenamed("cluster", "cluster_b")
    a.join(b, Seq("vec_id"))
      .select(col("vec_id"), col("cluster_a"), col("cluster_b"),
        (col("cluster_a") * k + col("cluster_b")).as("consensus_key"))
  }
}
