package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: keep the payload as a
  * `binary` column, partition by size class, and run decode/feature
  * extraction as a *batched per-partition* function (in PySpark this would
  * be `mapInPandas`; the Scala equivalent is a typed `mapPartitions` over
  * an iterator of rows, which Catalyst plans as one
  * Deserialize->MapPartitions->Serialize pipeline — no per-row UDF
  * dispatch). The decode itself is STUBBED (no codec libraries in this
  * container) with a deterministic fake; schema, batching and partitioning
  * are real.
  */
object Multimodal {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, frames: Long, format: String)

  /** Wrap text docs as opaque binary payloads (utf-8) — stands in for an
    * image/audio bytes column read from parquet/Iceberg. */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))

  /** STUB decoder: deterministic metadata from the payload bytes. A real
    * deployment swaps `decodeOne` for an image/audio codec call; the
    * batch shape (iterator-in/iterator-out per partition) is what matters
    * for throughput and is kept real. */
  private def decodeOne(d: BinaryDoc): MediaMeta = {
    val n = d.payload.length.toLong
    MediaMeta(d.doc_id, n,
      width = 64L + n % 576L,
      height = 36L + (n * 7L) % 324L,
      frames = 1L + n % 24L,
      format = "fake/rgb8")
  }

  /** Batched decode over partitions (the mapInPandas analog). */
  def decodeMeta(spark: SparkSession, binaryDocs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    binaryDocs.as[BinaryDoc].mapPartitions(_.map(decodeOne))
  }

  /** End-to-end: docs -> binary payload -> batched stub decode -> metadata. */
  def extract(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, asBinary(docs)).toDF()

  /** Frame sampling: at most `maxFrames` frame indices per video via a
    * deterministic stride (ceil(frames/maxFrames)) — the work-reduction
    * step a video pipeline runs BEFORE per-frame decode/feature
    * extraction. Pure column expressions over the metadata: the sampling
    * plan (one row per kept frame) never touches payload bytes, so the
    * expensive codec fan-out is bounded up front. */
  def sampleFrames(meta: DataFrame, maxFrames: Int = 4): DataFrame =
    meta
      // frames <= 0 would make stride 0 and sequence() throw; such rows
      // have nothing to sample — drop them instead of failing the job
      .filter(col("frames") > 0)
      .select(col("doc_id"), col("frames"),
        greatest(ceil(col("frames").cast("double") / maxFrames).cast("long"),
          lit(1L)).as("stride"))
      .select(col("doc_id"), col("frames"), col("stride"),
        explode(sequence(lit(0L), col("frames") - 1, col("stride")))
          .as("frame_idx"))
}
