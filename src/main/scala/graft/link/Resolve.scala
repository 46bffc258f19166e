package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity linking: resolve relation-mention refs to canonical names.
  *
  * Reference analog: the caller-object resolution precedence chain
  * (package/call_graph.py:703-749): self -> super -> local var -> param ->
  * import alias -> identity. The transcript grammar collapses the three
  * scoped-binding levels (local/param/import) into one conversation-scoped
  * alias map with *latest-binding-wins* shadowing (the reference's scoped
  * lookup semantics, package/adapters/CppAstAdapter.py:510-518), giving the
  * equally-total deterministic chain:
  *
  *   1. `self`  -> the first entity definition at or before the use site
  *                 (analog of `self` -> enclosing class, call_graph.py:738)
  *   2. `a<k>`  -> most recent alias binding at or before the use site
  *   3. else    -> identity (call_graph.py:748)
  *
  * Distribution: the reference resolves row-by-row against Python dicts.
  * Here the as-of alias lookup is a *window*, not a join against collected
  * state: binding events and use events for the same (conv_id, alias) are
  * unioned, ordered by (turn_idx, mention_idx), and
  * `last(target, ignoreNulls)` over an unbounded-preceding frame yields the
  * latest binding in scope. Everything shuffles on conversation-local keys
  * (conv_id[, ref]) — uniform, no skew, no driver-side state, and identical
  * results at any parallelism.
  */
object Resolve {

  private val aliasPat = "^a[0-9]+$"

  /** Alias-binding events: (conv_id, ref, turn_idx, mention_idx, target). */
  def bindings(mentions: DataFrame): DataFrame =
    mentions
      .filter(col("kind") === "alias_binding")
      .select(
        col("conv_id"), col("turn_idx"), col("mention_idx"),
        col("subj").as("ref"), col("obj").as("target"))

  /** Resolve subj/obj of every relation mention. Output:
    * conv_id, turn_idx, mention_idx, subj, pred, obj, ts (resolved).
    *
    * `self` and aliases ride the same event stream: entity_def mentions
    * emit a binding event for the pseudo-ref "self"; self resolves to the
    * FIRST definition at or before the use site (the enclosing-scope
    * semantics — a def always precedes its uses in the reference's walk),
    * aliases to the LATEST binding (shadowing). A use before any binding
    * falls back to identity. This matches the streaming stateful resolver
    * exactly, including out-of-grammar shapes like self-before-any-def. */
  def resolved(mentions: DataFrame): DataFrame = {
    val rels = mentions.filter(col("kind") === "relation")

    // hop is part of the natural key: a chain segment fans out to several
    // relation rows sharing (conv_id, turn_idx, mention_idx) — without hop
    // in the re-join key the per-side resolutions would cross-match.
    val uses = rels
      .select(col("conv_id"), col("turn_idx"), col("mention_idx"), col("hop"),
        lit("s").as("side"), col("subj").as("ref"))
      .unionByName(rels.select(col("conv_id"), col("turn_idx"),
        col("mention_idx"), col("hop"), lit("o").as("side"), col("obj").as("ref")))
      .filter(col("ref").rlike(aliasPat) || col("ref") === "self")

    val selfBindings = mentions
      .filter(col("kind") === "entity_def")
      .select(col("conv_id"), lit("self").as("ref"), col("turn_idx"),
        col("mention_idx"), lit(0).as("hop"), lit(null).cast("string").as("side"),
        col("subj").as("target"))

    val events = bindings(mentions)
      .select(col("conv_id"), col("ref"), col("turn_idx"), col("mention_idx"),
        lit(0).as("hop"), lit(null).cast("string").as("side"), col("target"))
      .unionByName(selfBindings)
      .unionByName(uses.select(col("conv_id"), col("ref"), col("turn_idx"),
        col("mention_idx"), col("hop"), col("side"),
        lit(null).cast("string").as("target")))

    val w = Window
      .partitionBy("conv_id", "ref")
      .orderBy("turn_idx", "mention_idx", "hop")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val refResolved = events
      .withColumn("in_scope",
        when(col("ref") === "self", first("target", ignoreNulls = true).over(w))
          .otherwise(last("target", ignoreNulls = true).over(w)))
      .filter(col("side").isNotNull) // keep use events only
      .select(col("conv_id"), col("turn_idx"), col("mention_idx"), col("hop"),
        col("side"), coalesce(col("in_scope"), col("ref")).as("resolved_ref"))

    // pivot both sides into one row per mention key (each (key, side) is
    // unique, so min() just picks the value): ONE join back to the
    // relation stream instead of two — one less shuffle+sort of the
    // mention-key stream
    val bySide = refResolved
      .groupBy("conv_id", "turn_idx", "mention_idx", "hop")
      .agg(
        min(when(col("side") === "s", col("resolved_ref"))).as("subj_res"),
        min(when(col("side") === "o", col("resolved_ref"))).as("obj_res"))

    rels
      .join(bySide, Seq("conv_id", "turn_idx", "mention_idx", "hop"), "left")
      .select(
        col("conv_id"), col("turn_idx"), col("mention_idx"), col("hop"),
        coalesce(col("subj_res"), col("subj")).as("subj"),
        col("pred"),
        coalesce(col("obj_res"), col("obj")).as("obj"),
        col("ts"))
  }
}
