package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Second wave of query-engine coverage: the remaining TPC-H-style
  * shapes (selective scan agg, group-filtered IN subqueries,
  * disjunctive predicates, ratio aggregates, distinct-count rollups,
  * top-k by revenue). Same oracle-exactness conventions as Analytics.
  */
object Analytics2 {

  private val dec = "decimal(18,2)"
  private def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Q6-style: single-scan selective aggregate — the pushdown stress
    * test (filters + 3-column ReadSchema reach the scan). */
  def q6Selective(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** Q10-style: top 20 customers by returned-item revenue. No broadcast
    * hint on customer (grows with sf — AQE decides; VERDICT r1 item 3);
    * at test SF the threshold still broadcasts it (asserted in spec). */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(sum(col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q14-style ratio aggregate: promo revenue share (one division at
    * the very end → bit-exact). */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-07-01"))
    val p = Tables.part(s, dir)
    val joined = l.join(p, col("l_partkey") === col("p_partkey"))
    val rev = col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))
    joined.agg(
      (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(dec))).cast("double") /
        sum(rev).cast("double")).as("promo_share"),
      count(lit(1)).as("n_items"))
  }

  /** Q16-style: distinct supplier count per (brand, type) bucket. */
  def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(5, 10, 15, 20))
    Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q18-style: large-volume orders via aggregated IN-subquery. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("total_qty"))
      .filter(col("total_qty") > 200)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
  }

  /** Q19-style disjunctive predicates across a join. */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    Tables.lineitem(s, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) && col("l_quantity") >= 10) ||
        (col("p_brand") === "Brand#9" && col("p_size").between(10, 30) && col("l_quantity") < 10))
      .agg(dsum(col("l_extendedprice")).as("gross"), count(lit(1)).as("n_items"))

  }

  /** Q22-style: high-balance customers with no orders in a window —
    * scalar subquery + anti join combined. */
  def q22Dormant(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast(dec)).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_bal"))
  }

  /** Extended window functions: ntile, dense_rank, percent_rank,
    * first/last value over a deterministic frame. */
  def qWindow2(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") <= 3000)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        first(col("o_orderkey")).over(w).as("first_key"))
  }

  /** RANGE-frame windows: running aggregates over a VALUE range
    * (orders within 50k price below the current row) rather than a row
    * count — RANGE frames include all peers of the boundary values, so
    * the result is deterministic under ties without a tiebreaker
    * column. The frame sum is decimal-cast (order-independent). */
  def qWindow3(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
      .rangeBetween(-50000L, 0L)
    Tables.orders(s, dir)
      .filter(col("o_orderkey") <= 2500)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_within_50k"),
        sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("sum_within_50k"))
  }

  /** Collect/array aggregation: per-order sorted line numbers as a
    * canonical string (portable across engines' list orderings). */
  def qCollect(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 2000)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("line_nos"),
        size(array_distinct(collect_list(col("l_returnflag")))).cast("long").as("n_flags"))

  /** CUBE over two dimensions (all grouping-set combinations). */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))

  /** Null semantics: NULLIF / COALESCE / null-safe equality. */
  def qNullSemantics(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("maybe_priority", nullif(col("o_orderpriority"), lit("3-MEDIUM")))
    o.groupBy(col("o_orderstatus"))
      .agg(
        count(col("maybe_priority")).as("n_nonnull"),
        count(when(col("maybe_priority").isNull, 1)).as("n_null"),
        count(when(col("maybe_priority") <=> lit("1-URGENT"), 1)).as("n_urgent_nullsafe"),
        countDistinct(coalesce(col("maybe_priority"), lit("(none)"))).as("n_distinct_coalesced"))
  }

  /** Exact percentiles (linear interpolation — matches DuckDB's
    * quantile_cont definition). */
  def qPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"))

  /** Set operations: customers with both large and urgent orders
    * (INTERSECT) and with large but no urgent orders (EXCEPT). */
  def qIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val large = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"))
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val both = large.intersect(urgent).select(col("o_custkey"), lit("both").as("bucket"))
    val only = large.except(urgent).select(col("o_custkey"), lit("large_only").as("bucket"))
    both.union(only).groupBy(col("bucket")).agg(count(lit(1)).as("n_customers"))
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube) with
    * grouping() markers distinguishing the aggregation levels. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Correlated EXISTS with aggregate (Q21 flavor): suppliers whose
    * items are always shipped late relative to a cutoff. */
  def q21LateSuppliers(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_items"),
        count(when(col("l_shipdate") > lit("2000-01-01"), 1)).as("n_late"))
      .filter(col("n_late") * 4 > col("n_items"))
      .select(col("l_suppkey"), col("n_items"), col("n_late"))
  }
}
