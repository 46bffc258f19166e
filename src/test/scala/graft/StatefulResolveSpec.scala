package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.extract.Extract
import graft.link.Resolve
import graft.schema.Mention
import graft.sources.Transcripts
import graft.streaming.StatefulResolve

class StatefulResolveSpec extends SparkSpec {
  import spark.implicits._

  private def asTuples(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getInt(1), r.getInt(2),
      r.getString(3), r.getString(4), r.getString(5))).toSet

  test("stateful streaming resolver matches the batch resolver") {
    val corpus = Transcripts.synthetic(spark, nConvs = 60, turnsPerConv = 10, vocab = 20)
    val mentions = Extract.mentions(corpus).as[Mention]
    val batch = asTuples(Resolve.resolved(Extract.mentions(corpus))
      .select("conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj").collect())

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Mention]
    val q = StatefulResolve.resolve(spark, mem.toDS())
      .writeStream.format("memory").queryName("sres").outputMode("append").start()
    try {
      // deliver in two turn-ordered chunks: state must carry bindings from
      // chunk 1 (earlier turns) into chunk 2
      val all = mentions.collect().sortBy(m => (m.conv_id, m.turn_idx, m.mention_idx))
      val (early, late) = all.partition(_.turn_idx < 5)
      mem.addData(early.toSeq: _*)
      q.processAllAvailable()
      mem.addData(late.toSeq: _*)
      q.processAllAvailable()
      val got = asTuples(spark.table("sres")
        .select("conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj").collect())
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("batch execution of the stateful operator also matches") {
    val corpus = Transcripts.synthetic(spark, nConvs = 40, turnsPerConv = 8, vocab = 15)
    val mentions = Extract.mentions(corpus)
    val batch = asTuples(Resolve.resolved(mentions)
      .select("conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj").collect())
    val stateful = asTuples(StatefulResolve.resolve(spark, mentions.as[Mention])
      .toDF().select("conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj").collect())
    assert(stateful === batch)
  }
}
