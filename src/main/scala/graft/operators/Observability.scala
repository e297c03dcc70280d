package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Observability — the reference's Meta/progress tracking (reference
  * meta.go: ObjectMeta.RecordProcessed/RecordSkipped, ProcessingStatus)
  * re-expressed with Spark's Observation API: counters ride along the
  * job as observed metrics, no second pass over the data and no
  * driver-side mutexed state.
  */
object Observability {

  final case class TransferMeta(recordTotal: Long, recordProcessed: Long,
    recordSkipped: Long, valueSum: Double)

  /** Attach etly-style counters to a transfer plan. Returns the
    * transformed frame plus an Observation that yields the counters
    * once any action runs the plan. */
  def observedTransfer(s: SparkSession, dir: String): (DataFrame, Observation) = {
    val obs = Observation("transfer_meta")
    val processedPred = col("event_type") =!= "error"
    val df = Tables.events(s, dir)
      .observe(obs,
        count(lit(1)).as("record_total"),
        count(when(processedPred, 1)).as("record_processed"),
        count(when(!processedPred, 1)).as("record_skipped"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .filter(processedPred)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    (df, obs)
  }

  def metaOf(obs: Observation): TransferMeta = {
    val m = obs.get
    TransferMeta(
      m("record_total").asInstanceOf[Long],
      m("record_processed").asInstanceOf[Long],
      m("record_skipped").asInstanceOf[Long],
      m("value_sum").asInstanceOf[Double])
  }
}
