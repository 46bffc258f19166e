package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Physical-plan quality gates: the properties that matter at 100 TB,
  * asserted so a regression (lost broadcast, lost pushdown, lost pruning)
  * fails CI instead of shipping a 100x slower plan. */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("triple-forming join broadcasts the entity vocabulary") {
    val m = graft.extract.Extract.mentions(
      graft.sources.Transcripts.fromTpch(spark, sfDir))
    val t = graft.triples.Triples.knownOnly(
      graft.link.Resolve.resolved(m), graft.triples.Triples.entityNames(m))
    val p = plan(t)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast semi join, got:\n${p.take(2000)}")
  }

  test("transcript derivation broadcasts all dimension tables") {
    val p = plan(graft.sources.Transcripts.fromTpch(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"part/supplier/customer should broadcast, found $broadcasts")
  }

  test("column pruning reaches the parquet scan") {
    val df = TextOps.tokenCounts(spark.read.parquet(s"$sfDir/documents.parquet"))
    val p = plan(df)
    assert(p.contains("ReadSchema"))
    // lang/source/n_chars must NOT be read (only doc_id + text)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads more columns than the projection needs: $readSchema")
  }

  test("predicate pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") === 42L)
      .select("o_orderkey", "o_totalprice")
    val p = plan(df)
    assert(p.contains("PushedFilters") &&
      (p.contains("EqualTo(o_orderkey,42)") || p.contains("EqualTo(o_orderkey, 42)")),
      s"filter not pushed:\n${p.take(1500)}")
  }

  test("whole-stage codegen covers the extraction frontend") {
    val m = graft.extract.Extract.mentions(
      graft.sources.Transcripts.fromTpch(spark, sfDir))
    // must execute THIS frame's QueryExecution: AQE only finalizes (and
    // collapses codegen stages) on the executed plan; count() would build
    // a different QueryExecution and leave this one at the initial plan
    m.collect()
    val p = plan(m)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("*("),
      s"extraction should stay inside codegen (no UDF barriers):\n${p.take(1200)}")
  }

  test("brute-force ANN broadcasts the query side") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = plan(graft.ops.Similarity.bruteForceTopK(e, 5, 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side must broadcast:\n${p.take(1500)}")
  }
}
