package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics2, Patterns}
import graft.sources.Tables

class PatternsSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("salted skew join equals the plain join exactly and spreads the hot keys") {
    import org.apache.spark.sql.functions._
    val salted = Patterns.skewJoin(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .withColumn("hot_key", pmod(col("l_orderkey"), lit(3)).cast("int"))
      .join(graft.sources.Tables.nation(spark, sf)
        .filter(col("n_nationkey") < 3)
        .select(pmod(col("n_nationkey"), lit(3)).cast("int").as("hot_key"),
          col("n_name").as("bucket_name")), Seq("hot_key"))
      .groupBy(col("bucket_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("ANN top-k aggregates via ObjectHashAggregate — no window sort of candidates") {
    val plan = graft.operators.Similarity.bruteTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("Window"),
      "top-k must not fall back to sort-based aggregation or a window")
  }

  test("salted skew agg equals plain group-by exactly") {
    val salted = Patterns.skewAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("bucketed join plan has no shuffle exchange") {
    val df = Patterns.bucketedJoin(spark, sf)
    // the join itself (below the final small agg) must read pre-bucketed
    // tables: no ShuffleExchange feeding the SortMergeJoin
    val joinPlan = df.queryExecution.executedPlan.toString
    val joinSection = joinPlan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join should not re-shuffle on the join key:\n$joinPlan")
    assert(df.count() > 0)
  }

  test("typed aggregator matches untyped decimal math") {
    val typed = Patterns.typedAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val untyped = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg((sum((col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
        .cast("double") / 100 / count(lit(1))).as("avg_qty"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(typed == untyped)
  }

  test("q6 pushes both filters and a pruned schema to the scan") {
    val plan = Analytics2.q6Selective(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
    assert(!plan.contains("l_partkey"), "unused columns must be pruned")
  }

  test("codec roundtrip preserves every supplier row") {
    val n = Patterns.codecRoundtrip(spark, sf)
      .agg(sum(col("n_suppliers"))).collect()(0).getLong(0)
    assert(n == Tables.supplier(spark, sf).count())
  }
}
