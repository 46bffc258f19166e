package graft

import org.apache.spark.sql.functions._
import graft.canonical.Salt
import graft.extract.Extract
import graft.link.Resolve
import graft.sources.Transcripts
import graft.triples.Triples

/** Salting must change the physical distribution, never the result. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain join on a pathologically hot key") {
    // 90% of rows share one key — the hot-entity fixture
    val left = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k$i" else "HOT", i.toLong)
    }.toDF("k", "v")
    val right = (Seq("HOT") ++ (0 until 2000 by 10).map(i => s"k$i"))
      .map(k => (k, k.length.toLong)).toDF("k", "w")
    val plain = left.join(right, "k")
    val salted = Salt.joinSkewed(left, right, "k", s = 8, saltFrom = Seq("v"))
    assertSameRows(plain.select("k", "v", "w"), salted.select("k", "v", "w"))
  }

  test("salted semi join equals broadcast semi join on the hot-entity corpus") {
    // synthetic corpus with a hot entity in ~60% of relation turns
    val corpus = Transcripts.synthetic(spark, nConvs = 300, turnsPerConv = 12,
      vocab = 40, hotPct = 60)
    val m = Extract.mentions(corpus)
    val resolved = Resolve.resolved(m)
    val ents = Triples.entityNames(m)
    val plain = Triples.knownOnly(resolved, ents)
    val salted = Salt.semiJoinSkewed(
      resolved.withColumnRenamed("obj", "canonical_name"), ents,
      "canonical_name", s = 8, saltFrom = Seq("conv_id", "turn_idx", "mention_idx"))
      .withColumnRenamed("canonical_name", "obj")
    assertSameRows(
      plain.select("conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj"),
      salted.select("conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj"))
  }

  test("two-phase aggregation equals direct aggregation") {
    val df = (0 until 1000).map(i => (if (i % 5 == 0) "hot" else s"k${i % 37}", s"c${i % 97}"))
      .toDF("k", "conv")
    val direct = df.groupBy("k")
      .agg(sort_array(collect_set($"conv")).as("convs"))
    val twoPhase = Salt.twoPhaseAgg(df, "k", s = 4, saltFrom = Seq("conv"))(
      partial = Seq(collect_set($"conv").as("_p")),
      merge = Seq(sort_array(array_distinct(flatten(collect_list($"_p")))).as("convs")))
    assertSameRows(direct, twoPhase)
  }

  test("row salts are deterministic and bounded") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("k", "v")
    val s1 = df.select(Salt.rowSalt(4, col("v")).as("s")).collect().map(_.getLong(0))
    val s2 = df.select(Salt.rowSalt(4, col("v")).as("s")).collect().map(_.getLong(0))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 4))
  }
}
