package graft

import org.apache.spark.sql.functions._
import graft.extract.Extract

/** Grammar goldens — ports the reference's mock-snippet -> expected-rows
  * pattern (package/tests/test_ast_processor.py:171-246). */
class ExtractSpec extends SparkSpec {

  private def mentionTuples(df: org.apache.spark.sql.DataFrame) =
    rowSet(df.select("conv_id", "turn_idx", "mention_idx", "kind", "subj", "pred", "obj", "attr"))

  test("entity_def with and without state payload") {
    val m = Extract.mentions(turns(
      ("c1", 0, "define entity topic:x"),
      ("c1", 1, "define entity topic:y with qty=42")))
    assert(mentionTuples(m) === Set(
      Seq("c1", 0, 0, "entity_def", "topic:x", "", "", ""),
      Seq("c1", 1, 0, "entity_def", "topic:y", "", "", "42")))
  }

  test("alias binding and multi-segment turns keep positional mention_idx") {
    val m = Extract.mentions(turns(
      ("c1", 0, "some narration ; define entity a:b ; alias a1 => a:b")))
    assert(mentionTuples(m) === Set(
      Seq("c1", 0, 1, "entity_def", "a:b", "", "", ""),
      Seq("c1", 0, 2, "alias_binding", "a1", "", "a:b", "")))
  }

  test("relation mentions parse all three ref shapes") {
    val m = Extract.mentions(turns(
      ("c1", 0, "link self -[uses]-> a3 ; link t:x -[calls]-> t:y")))
    assert(mentionTuples(m) === Set(
      Seq("c1", 0, 0, "relation", "self", "uses", "a3", ""),
      Seq("c1", 0, 1, "relation", "t:x", "calls", "t:y", "")))
  }

  test("narration and malformed segments are ignored") {
    val m = Extract.mentions(turns(
      ("c1", 0, "hello world ; define entity ; link x -> y ; alias => foo"),
      ("c1", 1, "")))
    assert(m.count() === 0)
  }

  test("turn-order edges are lead() pairs per conversation") {
    val t = turns(("c1", 0, "x"), ("c1", 2, "x"), ("c1", 5, "x"), ("c2", 1, "x"))
    val e = Extract.turnOrderEdges(t)
    assert(rowSet(e) === Set(Seq("c1", 0, 2), Seq("c1", 2, 5)))
  }

  test("segment subgraph: every segment is a node; lead edges carry both kinds") {
    import spark.implicits._
    val t = Seq(("c1", 0, "hello world ; define entity t:x ; link t:x -[uses]-> t:x"))
      .toDF("conv_id", "turn_idx", "text")
    val nodes = Extract.segmentNodes(t).collect()
      .map(r => (r.getInt(2), r.getString(3))).sortBy(_._1)
    assert(nodes.toSeq === Seq((0, "narration"), (1, "entity_def"), (2, "relation")))
    val edges = Extract.segmentEdges(Extract.segmentNodes(t)).collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getString(4), r.getString(5))).sortBy(_._1)
    assert(edges.toSeq === Seq(
      (0, 1, "narration", "entity_def"), (1, 2, "entity_def", "relation")))
  }
}
