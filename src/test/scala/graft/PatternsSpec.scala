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

  test("bucketed join is an exchange-free SortMergeJoin once broadcast is off (ADVICE r16 #1)") {
    // at the spec SF the orders side fits under the broadcast threshold,
    // so the default plan is a BroadcastHashJoin and the no-shuffle
    // assertion above is vacuous for the SMJ claim; forcing broadcast
    // OFF must surface the co-located SortMergeJoin with NO shuffle
    // exchange on either join input — the property bucketing exists for
    graft.GraftSession.withSqlConfs(spark,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = Patterns.bucketedJoin(spark, sf)
      df.count() // finalize the adaptive plan under the pinned conf
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a SortMergeJoin with broadcast disabled:\n$plan")
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed SMJ must read co-located buckets, no exchange on either input:\n$plan")
    }
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

  test("z-order clustering enables stat-based skipping for 2-D box queries") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = java.nio.file.Files.createTempDirectory("graft_zspec").toString
    Patterns.zorderWrite(spark, sf, s"$base/zorder")
    // linear layout twin: same rows, same file count, clustered by the
    // 1-D insert order instead of the 2-D curve
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/linear")
    // AQE off for the measurement so the scan node sits in the executed
    // plan tree directly (metrics semantics are identical either way)
    def measure(path: String): (Seq[Any], Long) =
      Patterns.withSqlConfs(spark, "spark.sql.adaptive.enabled" -> "false") {
        val df = Patterns.boxQuery(spark.read.parquet(path))
        val res = df.collect().head.toSeq
        val rows = df.queryExecution.executedPlan
          .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }.sum
        (res, rows)
      }
    val (zRes, zRows) = measure(s"$base/zorder")
    val (lRes, lRows) = measure(s"$base/linear")
    assert(zRes == lRes, "layout must not change the result")
    // the linear layout's row groups all span the full l_partkey ×
    // l_suppkey space (no skip); the z-ordered groups cover narrow
    // boxes, so the pushed predicates drop most of them at the reader
    assert(zRows * 2 <= lRows,
      s"z-order should scan well under half the linear layout: $zRows vs $lRows")
  }

  test("runtime bloom filter prunes the fact scan before the shuffle join") {
    val (pruned, plan) = Patterns.withSqlConfs(spark, Patterns.BloomJoinConfs: _*) {
      val df = Patterns.bloomJoinPlan(spark, sf)
      val rows = df.collect().map(_.toSeq).toSet
      (rows, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("might_contain"),
      s"expected an injected bloom filter on the fact side:\n$plan")
    val plain = Patterns.bloomJoinPlan(spark, sf).collect().map(_.toSeq).toSet
    assert(pruned == plain && plain.nonEmpty,
      "the bloom filter must only remove rows that cannot match")
  }

  test("codec roundtrip preserves every supplier row") {
    val n = Patterns.codecRoundtrip(spark, sf)
      .agg(sum(col("n_suppliers"))).collect()(0).getLong(0)
    assert(n == Tables.supplier(spark, sf).count())
  }

  test("self-joined aggregate materializes its scan+shuffle once (ReusedExchange)") {
    val df = Patterns.exchangeReuse(spark, sf)
    df.collect() // AQE finalizes subplans on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      plan.contains("TableCacheQueryStage"),
      s"identical aggregate subtrees must share one exchange, got:\n${plan.take(3000)}")
    // and the fact table appears as ONE scan in the FINAL plan (the
    // adaptive toString also prints the pre-reuse Initial Plan section,
    // which would double-count)
    val finalSection = plan.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(finalSection).length
    assert(scans <= 1, s"expected a single lineitem scan, found $scans in:\n${finalSection.take(3000)}")
  }
}
