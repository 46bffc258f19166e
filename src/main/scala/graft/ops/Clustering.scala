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

  /** One full Lloyd iteration: seed centroids = vectors with vec_id < k,
    * assign, recompute integer-rounded means, reassign.
    * Output: (vec_id, cluster). */
  def lloydStep(emb: DataFrame, k: Int = 8): DataFrame = {
    val q = quantized(emb)
    val c0 = q.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("xq").as("cq"))
    // Seeding assumes dense zero-based vec_ids; sparse ids would silently
    // yield < k centroids (an EMPTY c0 makes assign return an empty frame
    // with no error) — fail loudly instead. The count is a pushed-down
    // `vec_id < k` parquet scan, not a full pass.
    val nSeeds = c0.count()
    require(nSeeds == k,
      s"lloydStep: expected $k seed centroids (vec_id in [0,$k)), found " +
        s"$nSeeds — vec_ids must be dense and zero-based")
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
}
