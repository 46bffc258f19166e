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

  case class MediaFeatures(doc_id: Long, f: Array[Long])

  /** REAL per-byte feature extraction in the batched per-partition shape
    * (the feature-extract step of the decode/extract/resize/sample
    * quartet): a 16-bucket histogram over the raw payload bytes
    * (bucket = high nibble). Unlike the stubbed decoder this does the
    * actual byte work — the iterator-in/iterator-out pipeline Catalyst
    * plans as one Deserialize→MapPartitions→Serialize stage, which is
    * exactly where a codec/tensor kernel slots in at production. Counts
    * are exact longs (oracle-reproducible: the payload is utf-8 of
    * ASCII text, so byte values equal character codes). */
  def byteHistogram(spark: SparkSession, binaryDocs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    binaryDocs.as[BinaryDoc].mapPartitions(_.map { d =>
      val h = new Array[Long](16)
      d.payload.foreach(b => h((b & 0xFF) >> 4) += 1L)
      MediaFeatures(d.doc_id, h)
    })
  }

  /** Resize plan off the decoded metadata: fit into a `target` square
    * preserving aspect ratio, ALL integer arithmetic (floor division —
    * engine-exact; no float scale factor). Like [[sampleFrames]], the
    * plan is computed before any pixel touches memory, so the expensive
    * resample kernel sees exactly one (out_w, out_h) task per asset. */
  def resizePlan(meta: DataFrame, target: Int = 224): DataFrame =
    meta.filter(col("width") > 0 && col("height") > 0)
      .select(col("doc_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(target.toLong))
          .otherwise(greatest(expr(s"width * $target div height"), lit(1L)))
          .as("out_w"),
        when(col("width") >= col("height"),
          greatest(expr(s"height * $target div width"), lit(1L)))
          .otherwise(lit(target.toLong)).as("out_h"))

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
