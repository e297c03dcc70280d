package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight plan lint for cluster-scale safety — the library face of
  * the checks this repo's own test gates run on every operator. A
  * pipeline that passes locally on a 60k-row sample can still OOM or
  * melt a 1000-executor cluster through exactly two plan shapes these
  * catch statically, plus one data shape measured cheaply:
  *
  *  1. a broadcast HINT on a relation that grows with the data (the
  *     hint overrides AQE's size check, so at 100× the driver tries to
  *     broadcast a table that no longer fits),
  *  2. an accidental cartesian product (a missing join condition is
  *     |A|×|B| work — fine at sample SF, unrunnable at scale),
  *  3. shuffle-key skew (one hot key → one straggler task holding the
  *     whole stage; AQE splits skewed joins but a measurement tells you
  *     to salt BEFORE burning cluster time).
  *
  * Usage: `PlanChecks.lint(df, boundedTables = Set("region", "nation"))`
  * before submitting, and `PlanChecks.partitionSkew(df)` on a sample of
  * the keyed frame. Returns findings as strings (empty = clean) so
  * callers can fail CI or log; nothing here executes the plan except
  * `partitionSkew`, which runs one counting job.
  */
object PlanChecks {

  /** Broadcast hints whose subtree is NOT provably bounded. A subtree
    * is bounded iff every path of it terminates in (a) a scan of a
    * caller-declared bounded table (file-scan root path containing the
    * name), (b) a LocalRelation or Range literal, or (c) a global
    * (no-grouping) aggregate — one row regardless of input. The
    * aggregate only bounds the node it IS: a hinted growing×one-row
    * join still grows, so the check recurses structurally rather than
    * whitelisting whole subtrees. */
  def growingBroadcastHints(df: DataFrame,
      boundedTables: Set[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, ResolvedHint, UnaryNode, Range => LRange}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def boundedPlan(p: LogicalPlan): Boolean = p match {
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      // a global limit caps the subtree's cardinality at the literal
      // no matter what grows beneath it (LocalLimit alone does NOT —
      // its total is limit × partitions, and partitions grow with data)
      case _: GlobalLimit => true
      case lr: LogicalRelation => lr.relation match {
        // Match the path's NAME component, not a raw substring of the
        // whole URI (ADVICE r5: `/data/regional_facts.parquet` must NOT
        // pass as bounded "region"): the declared table name must equal
        // the final path segment exactly (`region.parquet`) or its stem
        // up to the first extension dot (`region` matches `region`,
        // `region.parquet`, `region.v2.orc` — never `regional_facts`).
        case fs: HadoopFsRelation => fs.location.rootPaths.forall { rp =>
          val name = rp.getName
          val stem = name.takeWhile(_ != '.')
          boundedTables.exists(t => t == name || t == stem)
        }
        case _ => false
      }
      case _: LocalRelation => true
      case _: LRange => true
      case j: Join => boundedPlan(j.left) && boundedPlan(j.right)
      case u: UnaryNode => boundedPlan(u.child)
      case _ => false
    }
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.flatMap { h =>
      if (boundedPlan(h.child)) None
      else Some("broadcast hint on a subtree that grows with the data " +
        s"(leaves: ${h.child.collectLeaves().map(_.nodeName).mkString(", ")})")
    }
  }

  /** Cartesian products / broadcast nested-loop joins in the physical
    * plan — the shape a missing join condition degrades to. */
  def cartesianProducts(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    Seq(
      Option.when(plan.contains("CartesianProduct"))(
        "CartesianProduct in physical plan (missing join condition?)"),
      Option.when(plan.contains("BroadcastNestedLoopJoin"))(
        "BroadcastNestedLoopJoin in physical plan (non-equi or conditionless join)")
    ).flatten
  }

  /** Static lint: both structural checks, findings or empty. */
  def lint(df: DataFrame, boundedTables: Set[String] = Set.empty): Seq[String] =
    growingBroadcastHints(df, boundedTables) ++ cartesianProducts(df)

  /** Partition-balance measurement — run on (a sample of) a frame
    * AFTER its keyed repartition/join to see whether the key
    * distribution needs salting: one counting job, returns a 1-row
    * frame with the partition count, max/avg rows per partition, and
    * their ratio (≫1 = a straggler at scale; AQE's skew-join split
    * helps joins, but aggregations over a hot key need salting —
    * operators.Patterns.skewAgg is the recipe). */
  def partitionSkew(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_partitions"),
        max(col("n")).as("max_rows"),
        avg(col("n")).as("avg_rows"))
      .select(col("n_partitions"), col("max_rows"), col("avg_rows"),
        (col("max_rows") / col("avg_rows")).as("skew_ratio"))
}
