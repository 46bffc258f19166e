package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mention extraction: turn text -> typed mention rows.
  *
  * Reference analog: the recursive AST walk emitting 4 mention kinds
  * (package/call_graph.py:388-435, package/ast_processor.py:85-122). The
  * reference appends one-row pandas frames inside a Python walk (O(n^2));
  * here the whole frontend is `posexplode(split(...))` + regex column
  * expressions — fully codegen'd, no UDF, no per-row driver work, and the
  * scan only needs (conv_id, turn_idx, text, ts) thanks to column pruning.
  *
  * One turn -> N mention rows (the Generator/UDTF shape) via posexplode;
  * `mention_idx` is the segment position inside the turn, making
  * (conv_id, turn_idx, mention_idx) a stable natural key (replaces the
  * reference's global walk-order counters, call_graph.py:44-48).
  */
object Extract {

  /** Single source of truth for the transcript grammar (shared with the
    * test oracle). */
  object Grammar {
    val name = "[A-Za-z]+:[A-Za-z0-9_#]+"
    val ref = s"(?:self|a[0-9]+|$name)"
    // `extends <parent>` = container/inheritance clause (reference
    // class_class_edges 'inherits_from', knowledge_graph.py:1122-1197)
    val defRe = s"^define entity ($name)(?: with qty=([0-9]+))?(?: extends ($name))?$$"
    val aliasRe = s"^alias (a[0-9]+) => ($name)$$"
    val linkRe = s"^link ($ref) -\\[([a-z_]+)\\]-> ($ref)$$"
    // two-hop chain: one segment -> TWO relation mentions (the reference's
    // chained-call splitting a.b().c(), CppAstAdapter.py:528-549 — one
    // mention row fans out to multiple resolved triples)
    val chainRe = s"^chain ($ref) -\\[([a-z_]+)\\]-> ($ref) -\\[([a-z_]+)\\]-> ($ref)$$"
    val segmentSep = " ; "
  }

  /** Extract all mentions. Output: conv_id, turn_idx, mention_idx, kind,
    * subj, pred, obj, attr, parent, ts (absent fields are "", never null).
    *
    * A segment expands to an ARRAY of mention structs which is then
    * inline-exploded (the 0..n Generator shape): def/alias/link segments
    * yield one row, a two-hop `chain` segment yields TWO relation rows
    * sharing the segment's mention_idx — the chained-call flatMap (L4)
    * expressed as array<struct> + explode, no UDF. */
  def mentions(transcripts: DataFrame): DataFrame = {
    import Grammar._
    val segs = transcripts.select(
      col("conv_id"), col("turn_idx"), col("ts"),
      posexplode(split(col("text"), segmentSep)).as(Seq("mention_idx", "seg")))

    // cheap prefix dispatch short-circuits the anchored regex for the
    // 3 of 4 productions that can't match (every production has a fixed
    // leading keyword); the full regex still validates the match
    val isDef = col("seg").startsWith("define entity ") && col("seg").rlike(defRe)
    val isAlias = col("seg").startsWith("alias ") && col("seg").rlike(aliasRe)
    val isLink = col("seg").startsWith("link ") && col("seg").rlike(linkRe)
    val isChain = col("seg").startsWith("chain ") && col("seg").rlike(chainRe)

    def m(kind: String, subj: Column, pred: Column, obj: Column,
        attr: Column, parent: Column) =
      struct(lit(kind).as("kind"), subj.as("subj"), pred.as("pred"),
        obj.as("obj"), attr.as("attr"), parent.as("parent"))
    def g(re: String, i: Int) = regexp_extract(col("seg"), re, i)
    val e = lit("")

    val expanded = when(isDef, array(
        m("entity_def", g(defRe, 1), e, e, g(defRe, 2), g(defRe, 3))))
      .when(isAlias, array(
        m("alias_binding", g(aliasRe, 1), e, g(aliasRe, 2), e, e)))
      .when(isLink, array(
        m("relation", g(linkRe, 1), g(linkRe, 2), g(linkRe, 3), e, e)))
      .when(isChain, array(
        m("relation", g(chainRe, 1), g(chainRe, 2), g(chainRe, 3), e, e),
        m("relation", g(chainRe, 3), g(chainRe, 4), g(chainRe, 5), e, e)))

    segs
      // project the expansion ONCE as a bound attribute: Spark shares no
      // subexpressions between Filter and Generate, so filtering on the
      // raw expression and then exploding it would run every regex +
      // struct build twice per segment
      .select(col("conv_id"), col("turn_idx"), col("mention_idx"), col("ts"),
        expanded.as("_ms"))
      .filter(col("_ms").isNotNull) // narration -> no mention rows
      .select(col("conv_id"), col("turn_idx"), col("mention_idx"), col("ts"),
        posexplode(col("_ms")).as(Seq("hop", "m")))
      .select(col("conv_id"), col("turn_idx"), col("mention_idx"),
        col("m.kind").as("kind"), col("m.subj").as("subj"),
        col("m.pred").as("pred"), col("m.obj").as("obj"),
        col("m.attr").as("attr"), col("m.parent").as("parent"),
        // hop disambiguates the 0..n rows a chain segment fans out to:
        // (conv_id, turn_idx, mention_idx, hop) stays a natural key
        col("hop").cast("int").as("hop"),
        col("ts"))
  }

  /** Per-turn segment subgraph nodes (reference subgraph_nodes,
    * function_graph.py:99-148): every segment of every turn — including
    * narration — becomes a node keyed by the composite
    * (conv_id, turn_idx, seg_idx), labeled with its grammar kind. */
  def segmentNodes(transcripts: DataFrame): DataFrame = {
    import Grammar._
    transcripts.select(col("conv_id"), col("turn_idx"),
      posexplode(split(col("text"), segmentSep)).as(Seq("seg_idx", "seg")))
      .select(col("conv_id"), col("turn_idx"), col("seg_idx"),
        when(col("seg").startsWith("define entity ") && col("seg").rlike(defRe), "entity_def")
          .when(col("seg").startsWith("alias ") && col("seg").rlike(aliasRe), "alias_binding")
          .when(col("seg").startsWith("link ") && col("seg").rlike(linkRe), "relation")
          .when(col("seg").startsWith("chain ") && col("seg").rlike(chainRe), "chain")
          .otherwise("narration").as("kind"))
  }

  /** Per-turn segment subgraph edges: consecutive-segment `lead` edges
    * (function_graph.py:61-68). The destination's label rides the SAME
    * window as the destination's index — lead(kind) — because
    * (conv_id, turn_idx, seg_idx) is unique by construction, so "the row
    * this edge points at" IS the next window row. The previous
    * composite-key join-back re-derived the whole posexplode+regex
    * segment scan a second time and paid a join shuffle for a value the
    * window already had (guide §2.4: remove shuffles outright). */
  def segmentEdges(segNodes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy("seg_idx")
    segNodes
      .withColumn("dst_seg", lead("seg_idx", 1).over(w))
      .withColumn("dst_kind", lead("kind", 1).over(w))
      .filter(col("dst_seg").isNotNull)
      .select(col("conv_id"), col("turn_idx"),
        col("seg_idx").as("src_seg"), col("dst_seg"),
        col("kind").as("src_kind"), col("dst_kind"))
  }

  /** Turn-order edges within each conversation: (turn_idx -> next turn).
    * Reference analog: consecutive-leaf `shift(-1)` edges
    * (package/function_graph.py:61-68) — same `lead` primitive. */
  def turnOrderEdges(transcripts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    transcripts
      .select(col("conv_id"), col("turn_idx"))
      .withColumn("next_turn_idx", lead("turn_idx", 1).over(w))
      .filter(col("next_turn_idx").isNotNull)
  }
}
