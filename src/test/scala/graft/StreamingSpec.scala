package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Events

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (0L, t("2024-01-01 00:05:00"), 1L, "click", 1.25, "{\"k\": 1}"),
    (1L, t("2024-01-01 00:40:00"), 1L, "click", 2.50, "{\"k\": 2}"),
    (2L, t("2024-01-01 01:10:00"), 2L, "purchase", 10.00, "{\"k\": 3}"),
    (3L, t("2024-01-01 01:20:00"), 1L, "click", 0.75, "{\"k\": 4}"),
    (4L, t("2024-01-01 03:00:00"), 2L, "error", 5.00, "{\"k\": 5}"))

  private def toDf(s: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    s.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("streaming hourly agg (watermarked window) matches the batch plan") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val stream = Events.streamingHourly(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = stream.writeStream.format("memory")
      .queryName("hourly_agg").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = rowSet(spark.table("hourly_agg"))
      val want = rowSet(Events.hourlyAgg(toDf(rows)))
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("sessionization: 30-min gaps split sessions, ordered deterministically") {
    val s = Events.sessionize(toDf(rows)).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        r.getAs[Long]("n_events")).toMap
    // user 1: 00:05 | 00:40, 01:20 gaps: 35min -> split; 40min -> split
    assert(s === Map((1L, 1L) -> 1L, (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (2L, 1L) -> 1L, (2L, 2L) -> 1L))
  }

  test("streaming decontamination: stream-static shingle join matches batch counts") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (3L, "completely different words about spark shuffle partitions and joins ok"))
    val evalSet = docs.filter(_._1 == 1L).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val stream = graft.ops.Dedup.decontaminate(
      mem.toDF().toDF("doc_id", "text"), evalSet)
    val q = stream.writeStream.format("memory").queryName("decontam")
      .outputMode("complete").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = rowSet(spark.table("decontam"))
      val want = rowSet(graft.ops.Dedup.decontaminate(
        docs.toDF("doc_id", "text"), evalSet))
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("normalized decontamination: case/comment variants flag, stream matches batch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // doc 2 is doc 1 re-cased on EVERY word plus a trailing comment: raw
    // 8-grams differ everywhere, normalized 8-grams all collide
    val docs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "The Quick Brown Fox Jumps Over The Lazy Dog Near The River Bank # note"),
      (3L, "completely different words about spark shuffle partitions and joins ok"))
    val evalSet = docs.filter(_._1 == 100L).toDF("doc_id", "text")
    val batch = graft.ops.Dedup.decontaminateNormalized(
      docs.toDF("doc_id", "text"), evalSet)
    val flagged = batch.collect().map(_.getLong(0)).toSet
    assert(flagged.contains(2L), "re-cased+commented dup must be flagged")
    assert(!flagged.contains(3L))
    // raw decontamination misses the variant — normalization is the point
    val raw = graft.ops.Dedup.decontaminate(docs.toDF("doc_id", "text"), evalSet)
      .collect().map(_.getLong(0)).toSet
    assert(!raw.contains(2L))
    // stream/batch parity (normalization is a stateless projection)
    val mem = MemoryStream[(Long, String)]
    val stream = graft.ops.Dedup.decontaminateNormalized(
      mem.toDF().toDF("doc_id", "text"), evalSet)
    val q = stream.writeStream.format("memory").queryName("decontam_norm")
      .outputMode("complete").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      assert(rowSet(spark.table("decontam_norm")) === rowSet(batch))
    } finally q.stop()
  }

  test("streaming incremental near-dup probe: append-mode stream matches batch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different content about shuffle partitions and joins here"))
      .toDF("doc_id", "text")
    val index = graft.ops.Dedup.minhashBuckets(corpus)
    val incoming = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta iota"),
      (102L, "nothing in common with anything indexed at all ok"))
    val mem = MemoryStream[(Long, String)]
    // aggregation-free probe: stateless per-row signatures + two
    // stream-static joins -> runs in APPEND mode (no watermark state)
    val stream = graft.ops.Dedup.checkAgainstIndex(
      mem.toDF().toDF("doc_id", "text"), index, corpus)
    val q = stream.writeStream.format("memory").queryName("dup_probe")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val got = rowSet(spark.table("dup_probe"))
      val want = rowSet(graft.ops.Dedup.checkAgainstIndex(
        incoming.toDF("doc_id", "text"), index, corpus))
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate texts are dropped within the watermark, state bounded") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = graft.ops.Dedup.streamingExact(
      mem.toDF().toDF("doc_id", "ts", "text"))
    val q = stream.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, t("2024-01-01 00:00:00"), "same text"),
        (2L, t("2024-01-01 00:01:00"), "same text"),
        (3L, t("2024-01-01 00:02:00"), "other text"))
      q.processAllAvailable()
      // duplicate arriving in a LATER microbatch still deduped (state)
      mem.addData((4L, t("2024-01-01 00:03:00"), "same text"))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(3L) && ids.size === 2, s"got $ids")
      assert(ids.contains(1L) ^ ids.contains(2L),
        "exactly one copy of the duplicated text survives")
      assert(!ids.contains(4L), "cross-batch duplicate must be dropped")
    } finally q.stop()
  }

  test("late events within watermark are still aggregated") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val stream = Events.streamingHourly(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = stream.writeStream.format("memory")
      .queryName("late_agg").outputMode("complete").start()
    try {
      mem.addData(rows.head)
      q.processAllAvailable()
      mem.addData((9L, t("2024-01-01 00:01:00"), 3L, "click", 1.0, "{}")) // late but in watermark
      q.processAllAvailable()
      val n = spark.table("late_agg")
        .filter("hour_s = '2024-01-01 00:00:00' and event_type = 'click'")
        .collect().head.getAs[Long]("n_events")
      assert(n === 2L)
    } finally q.stop()
  }

  test("mention extraction runs unchanged under Structured Streaming") {
    // the extraction frontend is stateless column expressions, so the same
    // code is a valid streaming transform: stream a transcript micro-batch
    // through Extract.mentions and compare against the batch result.
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val turns = Seq(
      ("c1", 0, "user", "define entity t:x with qty=3 extends cat:c ; alias a1 => t:x", "", t("2024-01-01 00:00:00")),
      ("c1", 1, "tool", "link self -[uses]-> a1 ; chain a1 -[p]-> t:x -[q]-> t:x", "lk", t("2024-01-01 00:01:00")))
    val mem = MemoryStream[(String, Int, String, String, String, Timestamp)]
    val cols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val stream = graft.extract.Extract.mentions(mem.toDF().toDF(cols: _*))
    val q = stream.writeStream.format("memory")
      .queryName("stream_mentions").outputMode("append").start()
    try {
      mem.addData(turns: _*)
      q.processAllAvailable()
      val got = rowSet(spark.table("stream_mentions"))
      val want = rowSet(graft.extract.Extract.mentions(turns.toDF(cols: _*)))
      assert(got === want)
      assert(got.size === 5) // 1 def + 1 alias + 1 link + 2 chain hops
    } finally q.stop()
  }

  test("curation ops run unchanged under Structured Streaming (stateless filter)") {
    // lang-ID + hash-threshold sampling are pure per-row expressions, so
    // an ingest stream can be curated with the same code as the batch
    // path — no state, no watermark, identical keep decisions.
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "the of and to in a is it for on the and"),
      (2L, "der die und das ist ein nicht mit sich auf"),
      (3L, "el la de que y en un ser se no"),
      (4L, "the and to of in it on for is a"))
    def curate(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Curation.stratifiedSample(
        graft.ops.TextOps.langId(df).select($"doc_id", $"pred_lang"),
        "pred_lang", Seq("en" -> "80"), "zz")
    val mem = MemoryStream[(Long, String)]
    val q = curate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = rowSet(spark.table("cur_stream"))
      val want = rowSet(curate(docs.toDF("doc_id", "text")))
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
