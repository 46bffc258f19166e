package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators, written once against DataFrames so the exact same
  * transformations run in batch (driver queries, DuckDB-verified) and in
  * Structured Streaming (readStream + watermark — see [[streamingHourly]]).
  *
  * The reference has no streaming surface (SURVEY.md §2.11) — its only
  * ordered, stateful computation is the git-history replay. These operators
  * are the streaming-native generalization: event-time windows, watermarks,
  * and gap-based sessionization over the `events` table.
  */
object Events {

  /** Tumbling 1-hour event-time aggregation. Money summed as exact cents
    * (per-row round then integer sum — associative, order-free). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour")("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Gap-based sessionization (30-minute inactivity): the classic
    * lag-flag-cumsum pattern. Microsecond-exact gap comparison. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    // events.ts is TIMESTAMP_NTZ in the parquet; unix_micros needs an
    // instant — the session runs in UTC so the cast is value-preserving
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("prev_us", lag(tsUs, 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || tsUs - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("end_s"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
  }

  /** Per-user event-type contingency table (crosstab / pivot with a fixed
    * column vocabulary — dynamic pivot would break schema determinism). */
  def userTypePivot(events: DataFrame,
      types: Seq[String] = Seq("click", "error", "purchase", "signup", "view")): DataFrame =
    events
      .groupBy("user_id")
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
      .select(col("user_id") +: types.map(t => col(t).cast("long").as(s"n_$t")): _*)

  /** Property extraction (the reference's regex scrape, X4) + per-type
    * rollup: pull the numeric k out of the JSON-ish props string. */
  def propsRollup(events: DataFrame): DataFrame =
    events
      .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
      .groupBy("event_type")
      .agg(
        sum(col("k")).as("sum_k"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        count(lit(1)).as("n_events"))

  /** Users with at least one purchase and no error events
    * (semi + anti join — the reference's Python-set membership J11). */
  def purchasersWithoutErrors(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase").select("user_id")
    val errors = events.filter(col("event_type") === "error").select("user_id")
    events.select("user_id").distinct()
      .join(purchases, Seq("user_id"), "left_semi")
      .join(errors, Seq("user_id"), "left_anti")
  }

  /** Structured Streaming variant of [[hourlyAgg]]: event-time window with
    * a 2-hour watermark for late data. Callers attach readStream/writeStream. */
  def streamingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("event_type"), col("n_events"), col("value_cents"))
}
