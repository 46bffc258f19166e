package graft.graph

import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed stage tables: every pipeline stage is materialized to a
  * parquet table exactly once and re-read by all consumers.
  *
  * This is the north rule's "resumable from checkpoint" requirement (and
  * the Spark-native replacement for the reference's by-hand pickle
  * checkpoints, /root/reference/README.md:121-136): a stage whose output
  * table already exists (atomic `_SUCCESS` commit) is skipped on re-run,
  * so a failed/killed pipeline resumes from the last completed stage
  * without recomputation. On a real cluster the same code targets Iceberg
  * tables; parquet directories with `_SUCCESS` carry the equivalent
  * snapshot-commit semantics in this sandbox (SURVEY.md §7.0).
  *
  * Each commit also appends per-partition lineage rows
  * (stage, partition_id, rows, wall_ms) and stage-level metric rows —
  * the north rule's observability requirement.
  */
object StageStore {

  /** Bump when the grammar/derivation logic changes — stage tables are
    * keyed by (input dir, logic version) so stale checkpoints never leak
    * across code versions. */
  val logicVersion = "v2"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def root: String = sys.props.getOrElse("graft.stage.dir",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_stages")

  def baseFor(inputKey: String): String =
    s"$root/${md5hex(inputKey + "|" + logicVersion).take(16)}"

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Materialize `build` at `<base>/<stage>` unless already committed;
    * return a reader of the committed table. */
  def getOrCreate(spark: SparkSession, inputKey: String, stage: String)(
      build: => DataFrame): DataFrame = {
    val base = baseFor(inputKey)
    val dir = s"$base/$stage"
    if (!exists(spark, dir)) {
      val t0 = System.nanoTime()
      build.write.mode("overwrite").parquet(dir)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      commitObservability(spark, base, stage, dir, wallMs)
    }
    spark.read.parquet(dir)
  }

  /** Per-partition lineage + stage metrics for a committed stage table.
    * One metadata-cheap pass (count(1) by partition id reads zero data
    * columns); partition rows are tiny, so they are collected once and
    * both observability tables are written from local data. */
  private def commitObservability(spark: SparkSession, base: String,
      stage: String, dir: String, wallMs: Long): Unit = {
    import spark.implicits._
    val parts = spark.read.parquet(dir)
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("output_rows"))
      .collect().map(r => (stage, r.getInt(0), r.getLong(1), wallMs))
    parts.toSeq.toDF("stage", "partition_id", "output_rows", "wall_ms")
      .coalesce(1).write.mode("append").parquet(s"$base/_lineage")
    val rows = parts.map(_._3).sum
    Seq(
      (stage, "output_rows", rows.toDouble),
      (stage, "wall_ms", wallMs.toDouble),
      (stage, "rows_per_sec", if (wallMs > 0) rows * 1000.0 / wallMs else 0.0))
      .toDF("stage", "name", "value")
      .coalesce(1).write.mode("append").parquet(s"$base/_metrics")
  }

  def lineage(spark: SparkSession, inputKey: String): DataFrame =
    spark.read.parquet(s"${baseFor(inputKey)}/_lineage")

  def metrics(spark: SparkSession, inputKey: String): DataFrame =
    spark.read.parquet(s"${baseFor(inputKey)}/_metrics")
}
