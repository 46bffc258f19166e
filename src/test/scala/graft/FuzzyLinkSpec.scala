package graft

import graft.link.FuzzyLink

class FuzzyLinkSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq("alpha_service", "beta_daemon", "gamma_worker")
    .toDF("name")

  test("exact surfaces short-circuit with full score") {
    val out = FuzzyLink.link(Seq("beta_daemon").toDF("surface"), dict).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("method") === "exact")
    assert(out.head.getAs[Long]("score_ppm") === 1000000L)
  }

  test("typo'd surfaces link to the nearest dictionary name") {
    val out = FuzzyLink.link(
      Seq("alpha_servce", "gamma_workerr").toDF("surface"), dict)
      .collect().map(r => r.getAs[String]("surface") -> r.getAs[String]("matched")).toMap
    assert(out === Map(
      "alpha_servce" -> "alpha_service",
      "gamma_workerr" -> "gamma_worker"))
  }

  test("surfaces with no plausible candidate are dropped") {
    val out = FuzzyLink.link(Seq("zzzzqqqq").toDF("surface"), dict).collect()
    assert(out.isEmpty)
  }

  test("trigram sets are padded and distinct") {
    val tg = Seq("aaa").toDF("n")
      .select(FuzzyLink.charTrigramsCol(org.apache.spark.sql.functions.col("n")))
      .collect().head.getSeq[String](0)
    assert(tg.toSet === Set("^aa", "aaa", "aa$"))
  }
}
