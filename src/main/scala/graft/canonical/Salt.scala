package graft.canonical

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew salting for hot keys (north rule: "conversation-level
  * partitioning with explicit skew salting"; SURVEY §4.3 hot-entity skew).
  *
  * AQE's skew-join splitting is the backstop; these helpers are the
  * explicit mechanism for the two places where a power-law canonical name
  * would otherwise pin one reducer:
  *  - joining a skewed stream against a key table that is too large to
  *    broadcast ([[joinSkewed]] / [[semiJoinSkewed]]): the skewed side gets
  *    a deterministic per-row salt, the key side is replicated x S;
  *  - aggregations with non-algebraic state (collect_set-style) via
  *    two-phase partial aggregation ([[twoPhaseAgg]]).
  *
  * Salts are xxhash64 of the full row key — deterministic, so results are
  * identical at any parallelism (no rand()).
  */
object Salt {

  /** Deterministic per-row salt in [0, s). */
  def rowSalt(s: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(s.toLong))

  /** Replicate `right` S times (one copy per salt value). */
  private def replicate(right: DataFrame, s: Int): DataFrame =
    right.withColumn("_salt", explode(sequence(lit(0L), lit(s.toLong - 1))))

  /** Inner equi-join `left ⋈ right on key`, with `left` skewed on `key`:
    * left rows get a salt derived from `saltFrom` (any columns that vary
    * within a hot key group — e.g. conv_id/turn_idx), right is replicated.
    * One hot key now spreads over S reducers. */
  def joinSkewed(left: DataFrame, right: DataFrame, key: String, s: Int,
      saltFrom: Seq[String]): DataFrame = {
    val l = left.withColumn("_salt", rowSalt(s, saltFrom.map(col): _*))
    l.join(replicate(right, s), Seq(key, "_salt")).drop("_salt")
  }

  /** left_semi variant (the triple-forming membership filter, L6, when the
    * entity vocabulary outgrows the broadcast threshold). */
  def semiJoinSkewed(left: DataFrame, right: DataFrame, key: String, s: Int,
      saltFrom: Seq[String]): DataFrame = {
    val l = left.withColumn("_salt", rowSalt(s, saltFrom.map(col): _*))
    l.join(replicate(right, s), Seq(key, "_salt"), "left_semi").drop("_salt")
  }

  /** Two-phase aggregation for hot group keys: partial aggregate by
    * (key, salt), then merge partials by key. `partial` and `merge` must
    * form an algebraic pair (e.g. collect_set / flatten+distinct). */
  def twoPhaseAgg(df: DataFrame, key: String, s: Int, saltFrom: Seq[String])(
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("_salt", rowSalt(s, saltFrom.map(col): _*))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}
