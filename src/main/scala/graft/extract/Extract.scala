package graft.extract

import org.apache.spark.sql.DataFrame
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
    val segmentSep = " ; "
  }

  /** Extract all mentions. Output: conv_id, turn_idx, mention_idx, kind,
    * subj, pred, obj, attr, ts (absent fields are "", never null). */
  def mentions(transcripts: DataFrame): DataFrame = {
    import Grammar._
    val segs = transcripts.select(
      col("conv_id"), col("turn_idx"), col("ts"),
      posexplode(split(col("text"), segmentSep)).as(Seq("mention_idx", "seg")))

    val isDef = col("seg").rlike(defRe)
    val isAlias = col("seg").rlike(aliasRe)
    val isLink = col("seg").rlike(linkRe)

    segs
      .withColumn("kind",
        when(isDef, "entity_def")
          .when(isAlias, "alias_binding")
          .when(isLink, "relation"))
      .filter(col("kind").isNotNull)
      .select(
        col("conv_id"),
        col("turn_idx"),
        col("mention_idx"),
        col("kind"),
        when(isDef, regexp_extract(col("seg"), defRe, 1))
          .when(isAlias, regexp_extract(col("seg"), aliasRe, 1))
          .otherwise(regexp_extract(col("seg"), linkRe, 1)).as("subj"),
        when(isLink, regexp_extract(col("seg"), linkRe, 2))
          .otherwise(lit("")).as("pred"),
        when(isAlias, regexp_extract(col("seg"), aliasRe, 2))
          .when(isLink, regexp_extract(col("seg"), linkRe, 3))
          .otherwise(lit("")).as("obj"),
        when(isDef, regexp_extract(col("seg"), defRe, 2))
          .otherwise(lit("")).as("attr"),
        when(isDef, regexp_extract(col("seg"), defRe, 3))
          .otherwise(lit("")).as("parent"),
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
        when(col("seg").rlike(defRe), "entity_def")
          .when(col("seg").rlike(aliasRe), "alias_binding")
          .when(col("seg").rlike(linkRe), "relation")
          .otherwise("narration").as("kind"))
  }

  /** Per-turn segment subgraph edges: consecutive-segment `lead` edges
    * (function_graph.py:61-68), with the destination's label fetched by a
    * composite-key join on (conv_id, turn_idx, seg_idx) — the reference's
    * (func_id, node_id) remap family (J4, hierarchical_graph.py:364-386).
    * Both sides are partitioned by the same composite key, so the join is
    * co-located with the window shuffle. */
  def segmentEdges(segNodes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy("seg_idx")
    val withNext = segNodes
      .withColumn("dst_seg", lead("seg_idx", 1).over(w))
      .filter(col("dst_seg").isNotNull)
      .select(col("conv_id"), col("turn_idx"),
        col("seg_idx").as("src_seg"), col("dst_seg"),
        col("kind").as("src_kind"))
    withNext.join(
      segNodes.select(col("conv_id"), col("turn_idx"),
        col("seg_idx").as("dst_seg"), col("kind").as("dst_kind")),
      Seq("conv_id", "turn_idx", "dst_seg"))
      .select(col("conv_id"), col("turn_idx"), col("src_seg"),
        col("dst_seg"), col("src_kind"), col("dst_kind"))
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
