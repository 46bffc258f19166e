package graft

import org.apache.spark.sql.functions._
import graft.canonical.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and separate components") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain -> comp 1
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle -> comp 10
      (20L, 21L)) // pair -> comp 20
    assert(ccOf(edges) === ufComponents(edges))
  }

  test("hot star (skewed degree) converges to its hub's component") {
    val hub = 5L
    val edges = (100L to 400L).map(i => (hub, i)) :+ ((400L, 401L))
    val got = ccOf(edges)
    assert(got === ufComponents(edges))
    assert(got.values.toSet === Set(5L))
  }

  test("long path needs O(log n) rounds, not O(n)") {
    val edges = (1L until 300L).map(i => (i, i + 1))
    assert(ccOf(edges) === ufComponents(edges))
  }

  test("matches union-find on a random-ish hash graph") {
    val edges = (0 until 500).map { i =>
      val a = math.abs((i * 2654435761L) % 97)
      val b = math.abs((i * 40503L + 7) % 97)
      (a, b)
    }.filter(e => e._1 != e._2)
    assert(ccOf(edges) === ufComponents(edges))
  }

  test("runWithNodes keeps isolated nodes as singletons") {
    val nodes = Seq(1L, 2L, 3L, 99L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = ConnectedComponents.runWithNodes(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 99L -> 99L))
  }

  test("deterministic across parallelism") {
    val edges = (1L until 200L).map(i => (i, i * 2 % 201))
    val df = edges.toDF("src", "dst")
    val a = ConnectedComponents.run(df.repartition(1)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents.run(df.repartition(13)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
