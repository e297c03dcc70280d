package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window => W}
import graft.sources.Tables

/** Batch equivalents of the reference's TimeWindow/Frequency transfer
  * scheduling (reference: config.go:20-21, README TimeWindow) — in
  * Spark, event-time windowing is declarative; the streaming versions
  * (graft.streaming) use the same window() calls under watermarks.
  * Outputs use epoch seconds/micros (bigint) to keep the oracle
  * timestamp-representation-proof.
  */
object Windows {

  /** Tumbling 1h window aggregation over the event stream. */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("win_start_s"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Hopping window: 2h length, 1h hop — each event lands in 2 windows. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("win.start")).as("win_start_s"), col("n_events"))

  /** Session windows via gaps-and-islands (30 min inactivity gap):
    * batch analog of streaming sessionization; same result as
    * session_window(ts, '30 minutes'). One shuffle on user_id. */
  def session(s: SparkSession, dir: String): DataFrame = {
    val byUser = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapped = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(W.unboundedPreceding, W.currentRow)))
    gapped.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Session windows via Spark's native session_window — same
    * semantics as the gaps-and-islands formulation (30 min gap), one
    * shuffle, mergeable session state at scale. */
  def sessionNative(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("win"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("n_events"),
        col("session_start_us"), col("session_end_us"), col("sum_value"))

  /** Event→event as-of join: for each 'error' event, the latest
    * preceding 'click' by the same user — last-observation-carried-
    * forward via one window pass (single shuffle on user_id; no join,
    * no explode — the scalable as-of shape). */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val byUser = W.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    Tables.events(s, dir)
      .withColumn("prior_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
          .over(byUser))
      .withColumn("prior_click_us",
        last(when(col("event_type") === "click", unix_micros(col("ts"))), ignoreNulls = true)
          .over(byUser))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        col("prior_click_id"), col("prior_click_us"),
        (unix_micros(col("ts")) - col("prior_click_us")).as("gap_us"))
  }
}
