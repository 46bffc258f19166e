package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple formation — THE triple-forming join.
  *
  * Reference analog: `edges = calls ⋈ nodes on combinedName`
  * (package/call_graph.py:276-315) with two modes:
  *   - `repo_functions_only=True`  -> inner join (drop triples whose object
  *     is not a defined entity) — here [[knownOnly]];
  *   - `repo_functions_only=False` -> left join + mint fresh entities for
  *     unmatched names (call_graph.py:281-315) — here [[mintedNames]].
  *
  * The entity side (distinct canonical names) is orders of magnitude
  * smaller than the mention side — broadcast, exactly where the reference
  * used an in-memory dict.
  */
object Triples {

  /** Distinct defined entity names. Container entities referenced by an
    * `extends` clause are part of the vocabulary too (reference: class
    * nodes exist for every base class, knowledge_graph.py:1122-1197). */
  def entityNames(mentions: DataFrame): DataFrame =
    mentions
      .filter(col("kind") === "entity_def")
      .select(col("subj").as("canonical_name"))
      .unionAll(mentions
        .filter(col("kind") === "entity_def" && col("parent") =!= "")
        .select(col("parent").as("canonical_name")))
      .distinct()

  /** Keep resolved relations whose object is a defined entity
    * (subjects always resolve to defined entities in this grammar, as in
    * the reference where the caller context is always a repo function).
    * Size-gated: broadcast while the vocabulary fits, salted shuffle semi
    * join (hot objects spread over salt reducers) above the gate. */
  def knownOnly(resolved: DataFrame, entities: DataFrame): DataFrame =
    graft.canonical.Joins.semiSkewSafe(
      resolved, entities.withColumnRenamed("canonical_name", "obj"),
      "obj", saltFrom = Seq("conv_id", "turn_idx", "mention_idx"))

  /** Names that must be minted when keeping unknown-object triples:
    * distinct resolved object names with no entity definition. Left side
    * is distinct-per-key (no skew) — gate the broadcast hint only. */
  def mintedNames(resolved: DataFrame, entities: DataFrame): DataFrame =
    graft.canonical.Joins.antiDistinct(
      resolved.select(col("obj").as("canonical_name")).distinct(),
      entities, "canonical_name")
}
