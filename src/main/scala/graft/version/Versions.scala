package graft.version

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity version chains from the ordered transcript log.
  *
  * Reference analog: FunctionVersioning.build
  * (package/function_versioning.py:127-411) — the reference's only ordered,
  * stateful computation: per symbol, sort by (authored_datetime, sha), emit
  * a new version only when the normalized-code hash changes, and chain
  * prev -> new with commit metadata. Here the "symbol" is the canonical
  * entity, the "commit time" is the turn timestamp, and the state payload
  * is the entity_def's attr. Two lag/row_number windows replace the
  * reference's per-symbol Python loop (function_versioning.py:290-339).
  *
  * Ordering is total and data-derived: (ts, conv_id, turn_idx, mention_idx)
  * — the stable-turn-ordering tiebreak demanded by the north rule.
  */
object Versions {

  private val ord = Seq(col("ts"), col("conv_id"), col("turn_idx"), col("mention_idx"))

  /** State events: entity_def mentions that carry a state payload. */
  def states(mentions: DataFrame): DataFrame =
    mentions
      .filter(col("kind") === "entity_def" && col("attr") =!= "")
      .select(col("subj").as("entity"), col("attr").as("state"),
        col("ts"), col("conv_id"), col("turn_idx"), col("mention_idx"))

  /** Version nodes: one row per state *change* (hash != previous hash, or
    * first observation), densely numbered per entity. */
  def versionNodes(mentions: DataFrame): DataFrame = {
    val w = Window.partitionBy("entity").orderBy(ord: _*)
    val changed = states(mentions)
      .withColumn("_prev", lag(col("state"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("state"))
      .drop("_prev")
    changed
      .withColumn("version_seq",
        row_number().over(Window.partitionBy("entity").orderBy(ord: _*)).cast("long"))
      .select(
        col("entity"), col("version_seq"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        // sha-256, matching the reference's body hash
        // (function_versioning.py:31-32); DuckDB oracle uses sha256()
        sha2(col("state"), 256).as("body_hash"),
        col("state"),
        col("conv_id"), col("turn_idx"))
  }

  /** Chain edges prev -> next per entity, carrying the provenance of the
    * newer version (function_versioning.py:325-349). */
  def versionEdges(versionNodes: DataFrame): DataFrame =
    versionNodes
      .filter(col("version_seq") > 1)
      .select(
        col("entity"),
        (col("version_seq") - 1).as("src_seq"),
        col("version_seq").as("dst_seq"),
        col("conv_id"), col("turn_idx"), col("body_hash"))

  /** Latest version per entity (reference: sort + groupby-tail(1),
    * function_versioning.py:386-395 — here a single max_by). */
  def latestVersions(versionNodes: DataFrame): DataFrame =
    versionNodes
      .groupBy("entity")
      .agg(
        max(col("version_seq")).as("version_seq"),
        max_by(col("state"), col("version_seq")).as("state"),
        max_by(col("body_hash"), col("version_seq")).as("body_hash"))
}
