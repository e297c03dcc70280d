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
    // materialize the rollup once: both the span derivation and the
    // grid join consume it, and without the checkpoint Spark expands
    // the subtree twice — two full source scans instead of one scan
    // plus a (users × active-hours) rollup reuse
    val hourly = e.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).as("hour_value_dec"))
      .localCheckpoint()
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

  /** Per-event-type least-squares TREND over the hourly revenue
    * series — closed-form slope from exact integer sums, no iteration
    * and no floating accumulation: x = hour index re-centered to the
    * global minimum hour (slope is shift-invariant, and centering
    * keeps every cross-sum far inside BIGINT — uncentered epoch-hours
    * × 10×-scale cent sums would overflow sx·sy at sf≈1), y = hourly
    * cents (the stream_resume integer-cents recipe). One grouped
    * rollup to hours, one 1-row broadcast for the min hour, one
    * grouped sum pass; the only doubles are the two terminal casts in
    * slope = (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²), computed from
    * bit-equal integers on both engines → hash-exact. */
  def trend(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"),
      expr("unix_micros(ts) div 1000000 div 3600").as("hour"),
      (col("value").cast(dec) * 100).cast("long").as("cents"))
    val hourly = e.groupBy(col("event_type"), col("hour"))
      .agg(sum(col("cents")).as("y"))
    // min over the rollup == min over the raw rows, and deriving it
    // from `hourly` lets Spark reuse the rollup's exchange instead of
    // scanning the source a second time (plan-audit finding)
    val minH = hourly.agg(min(col("hour")).as("h0"))
    hourly.crossJoin(broadcast(minH))
      .select(col("event_type"), (col("hour") - col("h0")).as("x"), col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n").as("n_hours"), col("sy").as("sum_cents"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"))
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
  /** Bounded frame → driver-resident LocalRelation: the
    * centroid/codebook contract (Similarity.kmeansCentroidSeq) applied
    * to the anomaly model — collect is legal ONLY because cardinality
    * is bounded by the schema (≤|event types| rows), and the payoff is
    * that every downstream broadcast hint sits on a LocalRelation leaf
    * (a bounded relation under the PlanChecks growing-hint gate, and a
    * plain cheap broadcast inside every streaming micro-batch). */
  private def localized(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    s.createDataFrame(rows, df.schema)
  }

  /** The trained "model": exact per-event-type median and MAD — two
    * grouped exact-percentile passes; ≤|event types| rows,
    * driver-resident, broadcast by every consumer (the batch scorer
    * below and the streaming scorer in Streams.streamAnomaly).
    * Memoized per corpus dir like Similarity's centroids/codebooks
    * (the train-once-per-session contract): the batch and streaming
    * scorers share ONE training pass per run. */
  private val statsCache =
    new graft.sources.VersionMemo[Seq[org.apache.spark.sql.Row]]

  private[graft] def robustStats(s: SparkSession, dir: String): DataFrame = {
    // dir-keyed with version eviction (ADVICE r10 #5's rationale), via
    // the shared per-key-locked graft.sources.VersionMemo
    val rows = statsCache(dir, Tables.versionedKey(s, dir, "events")) {
      val e = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = localized(s, e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med")))
      e.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("med")).as("med"),
          expr("percentile(abs(value - med), 0.5)").as("mad"))
        .collect().toSeq
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("med",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("mad",
          org.apache.spark.sql.types.DoubleType))))
  }

  def anomaly(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"), col("value"))
    // exact median/MAD need three passes over (event_type, value) —
    // a 100 TB run caches that 2-column projection once; each later
    // pass joins only the ≤|event types|-row broadcast stats
    e.join(broadcast(robustStats(s, dir)), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        count(when(abs(col("value") - col("med")) > lit(MadK) * col("mad"), 1))
          .as("n_outliers"))
  }
}
