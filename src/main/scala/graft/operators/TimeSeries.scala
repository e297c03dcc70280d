package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-series operators over the event stream: grid resampling with
  * LOCF gap fill, and robust (median/MAD) outlier detection — the two
  * shapes a metrics/monitoring consumer of the transfer pipeline runs
  * downstream of every `etl_time_window` ingest (reference
  * config.go:139 TimeWindow — the reference selects by time window;
  * these are the analytics its users run over the windows).
  *
  * Scale notes: the gap-fill grid is generated per user FROM THAT
  * USER'S OWN span (sequence + explode — no driver loop, no global
  * grid materialization), so the operator is one user_id shuffle for
  * the hourly rollup, one for the span, and one window pass over the
  * exploded grid; grid rows are (user × hours-active), never
  * (users × global span). Anomaly detection is two grouped exact
  * percentiles over a BOUNDED group count (event types) plus one
  * broadcast join back — value rows shuffle only for the percentile
  * partial aggregation.
  */
object TimeSeries {

  private val dec = "decimal(18,2)"

  /** Hourly grid + LOCF per user: every hour between a user's first
    * and last event gets a row; hours with no events carry the most
    * recent hourly revenue forward (last non-null over an ordered
    * window — the q_asof_join LOCF recipe on a generated grid).
    * Integer hour indexes (epoch div 3600) keep the grid arithmetic
    * and the oracle's generate_series identical; sums are decimal with
    * terminal double casts. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 1000000 div 3600").as("hour"),
        col("value"))
    val hourly = e.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).as("hour_value_dec"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("hour_value_dec"), ignoreNulls = true).over(w)
          .cast("double").as("filled_value"))
  }

  /** Outlier multiplier: |value − median| > MadK × MAD flags a row. */
  val MadK = 3.0

  /** Robust per-event-type anomaly counts: exact median of value, MAD
    * (median absolute deviation), and the count of rows beyond
    * MadK×MAD. Exact `percentile` (linear interpolation) matches
    * DuckDB's quantile_cont bit-for-bit on doubles (the q_percentile
    * parity recipe); the deviation pass re-reads only (event_type,
    * value) and the median join is a broadcast of ≤|event types|
    * rows. */
  def anomaly(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    // exact median/MAD need three passes over (event_type, value) —
    // a 100 TB run caches that 2-column projection once; each later
    // pass joins only the ≤|event types|-row broadcast stats
    e.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        count(when(abs(col("value") - col("med")) > lit(MadK) * col("mad"), 1))
          .as("n_outliers"))
  }
}
