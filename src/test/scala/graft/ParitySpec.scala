package graft

import org.apache.spark.sql.functions._
import graft.extract.Extract
import graft.link.Resolve
import graft.sources.Transcripts
import graft.triples.Triples
import graft.oracle.RefOracle

/** The BASELINE.json parity metric: triple precision/recall >= 0.95 vs the
  * reference-semantics oracle, on the deterministic synthetic corpus. */
class ParitySpec extends SparkSpec {

  private def engineTriples(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] = {
    val m = Extract.mentions(df)
    Triples.knownOnly(Resolve.resolved(m), Triples.entityNames(m))
      .select("subj", "pred", "obj").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  test("triple P/R >= 0.95 (exactly 1.0) vs reference-semantics oracle on synthetic corpus") {
    val corpus = Transcripts.synthetic(spark, nConvs = 200, turnsPerConv = 12,
      vocab = 50, hotPct = 20).cache()
    val oracleIn = corpus.select("conv_id", "turn_idx", "text").collect()
      .map(r => RefOracle.T(r.getString(0), r.getInt(1), r.getString(2))).toSeq
    val expected = RefOracle.triples(oracleIn)
    val got = engineTriples(corpus)
    assert(expected.nonEmpty, "oracle produced no triples — fixture broken")
    val tp = (got intersect expected).size.toDouble
    val precision = if (got.isEmpty) 0.0 else tp / got.size
    val recall = tp / expected.size
    assert(precision >= 0.95 && recall >= 0.95,
      s"precision=$precision recall=$recall missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(precision == 1.0 && recall == 1.0, "expected exact parity on deterministic grammar")
    corpus.unpersist()
  }

  test("pipeline output is identical at different parallelism (N vs 4N determinism)") {
    val base = Transcripts.synthetic(spark, nConvs = 100, turnsPerConv = 10, vocab = 30)
    val narrow = engineTriples(base.repartition(1))
    val wide = engineTriples(base.repartition(16))
    assert(narrow === wide)
  }

  test("per-turn text equality under stable turn ordering (row invariant)") {
    // Extraction must be a pure function of text: re-deriving mentions from
    // a shuffled copy of the corpus yields the same rows.
    val corpus = Transcripts.synthetic(spark, nConvs = 50, turnsPerConv = 8, vocab = 20)
    val a = Extract.mentions(corpus)
    val b = Extract.mentions(corpus.orderBy(rand(7)))
    assertSameRows(
      a.select("conv_id", "turn_idx", "mention_idx", "kind", "subj", "pred", "obj", "attr"),
      b.select("conv_id", "turn_idx", "mention_idx", "kind", "subj", "pred", "obj", "attr"))
  }
}
