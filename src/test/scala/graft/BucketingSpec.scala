package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: writing nodes and edges bucketed on the
  * join key lets the repeated FK-remap / degree / traversal joins run with
  * ZERO shuffles — the pre-partitioning that matters most at 100 TB, where
  * the edges table is re-joined constantly. (Parquet `bucketBy` here;
  * Iceberg bucket partition transforms on a cluster.) */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed node/edge tables join with no shuffle exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      val nodes = (0L until 1000L).map(i => (i, s"name_$i")).toDF("node_id", "canonical_name")
      val edges = (0L until 5000L).map(i => (i % 1000L, (i * 7) % 1000L, s"p${i % 3}"))
        .toDF("src_id", "dst_id", "edge_type")
      nodes.write.bucketBy(8, "node_id").sortBy("node_id")
        .mode("overwrite").saveAsTable(s"$db.nodes_b")
      edges.write.bucketBy(8, "src_id").sortBy("src_id")
        .mode("overwrite").saveAsTable(s"$db.edges_b")

      val joined = spark.table(s"$db.edges_b")
        .join(spark.table(s"$db.nodes_b"),
          col("src_id") === col("node_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") || plan.contains("BroadcastExchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(joined.count() === 5000L)

      // and the co-location survives an aggregation on the bucket key
      val agg = spark.table(s"$db.edges_b").groupBy("src_id").count()
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.replace("BroadcastExchange", "").contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n${aggPlan.take(1500)}")
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
