package graft

import org.apache.spark.sql.functions._
import graft.graph.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // 0 -> 1, 1 -> 0, 2 -> 1 (2 is dangling-in only; its mass leaks out)
  private def edges = Seq((0L, 1L), (1L, 0L), (2L, 1L))
    .toDF("src_id", "dst_id")

  test("integer PageRank matches the hand-computed fixed point steps") {
    // pr0 = 1e6 each; iter1: in(1)=pr(0)+pr(2)=2e6 -> 150000+1700000,
    // in(0)=pr(1)=1e6 -> 1000000, in(2)=0 -> 150000
    val pr1 = Analytics.pageRank(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr1 === Map(0L -> 1000000L, 1L -> 1850000L, 2L -> 150000L))
    // iter2: in(1)=1000000+150000 -> 150000+(85*1150000)div 100=1127500,
    // in(0)=1850000 -> 150000+1572500=1722500
    val pr2 = Analytics.pageRank(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr2 === Map(0L -> 1722500L, 1L -> 1127500L, 2L -> 150000L))
  }

  test("PageRank is bit-identical at any partitioning") {
    val big = (0L until 400L).map(i => (i, (i * 7 + 3) % 400))
      .toDF("src_id", "dst_id")
    assertSameRows(
      Analytics.pageRank(big.repartition(13), iters = 3),
      Analytics.pageRank(big.repartition(2), iters = 3))
  }

  test("multi-edges weigh contributions (multigraph semantics)") {
    val multi = Seq((0L, 1L), (0L, 1L), (0L, 2L)).toDF("src_id", "dst_id")
    val pr = Analytics.pageRank(multi, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deg(0)=3; node 1 receives 2 * (1e6 div 3), node 2 receives 1 share
    assert(pr(1L) === 150000L + 85L * 2L * 333333L / 100L)
    assert(pr(2L) === 150000L + 85L * 333333L / 100L)
  }
}
