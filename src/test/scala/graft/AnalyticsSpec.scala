package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

class AnalyticsSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("q1 aggregates match a direct recomputation") {
    val rows = Analytics.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(total == expected)
    rows.foreach { r =>
      val n = r.getAs[Long]("count_order")
      assert(math.abs(r.getAs[Double]("avg_qty") * n - r.getAs[Double]("sum_qty")) < 1e-6)
    }
  }

  test("filter + projection are pushed to the parquet scan") {
    val plan = Analytics.qFilterPushdown(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("p_size"),
      s"expected pushed filters in:\n$plan")
    assert(!plan.contains("p_retailprice"), "projection should prune unused columns")
  }

  test("dimension joins broadcast (q5 plan has no shuffle on dims)") {
    val plan = Analytics.q5MultiJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
  }

  test("top-k is TakeOrdered, not a full sort") {
    val plan = Analytics.qTopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$plan")
  }

  test("semi/anti join row counts bracket the base table") {
    val nOrders = Tables.orders(spark, sf).count()
    assert(Analytics.qSemiJoin(spark, sf).count() <= nOrders)
    val nCust = Tables.customer(spark, sf).count()
    val anti = Analytics.qAntiJoin(spark, sf).count()
    assert(anti > 0 && anti <= nCust)
  }

  test("partition-pruned read scans only the matching dt directory") {
    val df = operators.Etl.partitionPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"),
      s"expected partition filters in:\n$plan")
    assert(df.count() > 0)
  }

  test("Observation-based transfer meta matches a direct recount (etly Meta analog)") {
    val (df, obs) = operators.Observability.observedTransfer(spark, sf)
    val processedRows = df.count() // action populates the observation
    val meta = operators.Observability.metaOf(obs)
    val e = Tables.events(spark, sf)
    assert(meta.recordTotal == e.count())
    assert(meta.recordProcessed == processedRows)
    assert(meta.recordSkipped == e.filter(col("event_type") === "error").count())
    assert(meta.recordTotal == meta.recordProcessed + meta.recordSkipped)
  }

  test("as-of join: prior click is a click, precedes the error, same user") {
    val e = Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val asof = Windows.asofJoin(spark, sf)
    val joined = asof.filter(col("prior_click_id").isNotNull)
      .join(e.withColumnRenamed("event_id", "prior_click_id")
        .withColumnRenamed("user_id", "u2").withColumnRenamed("us", "us2"),
        Seq("prior_click_id"))
    assert(joined.filter(col("event_type") =!= "click").count() == 0)
    assert(joined.filter(col("u2") =!= col("user_id")).count() == 0)
    assert(joined.filter(col("us2") > col("prior_click_us")).count() == 0)
    assert(asof.filter(col("gap_us") < 0).count() == 0)
  }
}
