package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the Deequ/dbt-tests face of
  * the reference's per-record validity predicate (reference
  * config.go Filter + the error-budget policy in plans.Pipeline):
  * where `validExpr` gives one boolean per row, production pipelines
  * declare a RULE LIST and want per-rule violation counts in as few
  * passes as the rules allow.
  *
  * Compilation strategy, not a row loop:
  *  - all ROW-LEVEL rules (not-null, range, set membership, regex,
  *    arbitrary predicate) fold into ONE global aggregate — a single
  *    narrow scan computing `sum(violation_i)` for every rule at once
  *    (map-side partial agg; one job however many rules);
  *  - each UNIQUE rule is one groupBy on its key columns (count>1
  *    keys, summed surplus rows) — unavoidable shuffle, one per key
  *    set;
  *  - each FOREIGN-KEY rule is one left-anti join against the
  *    referenced dimension — AQE broadcasts bounded dims.
  *
  * At 100 TB the row-level pass dominates and stays a single scan; a
  * 50-rule suite costs the same scan as a 1-rule suite. Results are
  * exact integer counts → hash-gateable on any engine.
  */
object Constraints {

  sealed trait Rule { def name: String }
  /** `col IS NOT NULL`. */
  final case class NotNull(name: String, col: String) extends Rule
  /** lo ≤ col ≤ hi (inclusive). */
  final case class InRange(name: String, col: String, lo: Double, hi: Double) extends Rule
  /** col ∈ values. */
  final case class InSet(name: String, col: String, values: Seq[String]) extends Rule
  /** Arbitrary row predicate (SQL text) that must hold. */
  final case class Satisfies(name: String, predicate: String) extends Rule
  /** The key columns identify rows uniquely; violations = surplus rows. */
  final case class Unique(name: String, cols: Seq[String]) extends Rule
  /** Every non-null value of `col` exists in `dim`'s `dimCol`. */
  final case class RefIntegrity(name: String, col: String,
      dim: DataFrame, dimCol: String) extends Rule

  private def violation(r: Rule): Option[(String, Column)] = r match {
    case NotNull(n, c) => Some(n -> col(c).isNull)
    case InRange(n, c, lo, hi) =>
      Some(n -> !(col(c) >= lo && col(c) <= hi))
    case InSet(n, c, vs) => Some(n -> !col(c).isin(vs: _*))
    case Satisfies(n, p) => Some(n -> !expr(p))
    case _ => None
  }

  /** Evaluate the rule suite: one row per rule —
    * (rule, n_violations, n_rows). Row-level rules share a single
    * aggregate job over `df`; Unique/RefIntegrity add their own keyed
    * jobs. Deterministic output order (by rule name) is the caller's
    * sort; the frame is small (|rules| rows). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val rowLevel = rules.flatMap(violation)
    // ONE pass: every row-level rule as a conditional count in the
    // same global aggregate, plus the row total
    val aggs = count(lit(1)).as("__n") +:
      rowLevel.map { case (n, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(s"__v_$n") }
    val head = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = head.getAs[Long]("__n")
    val rowCounts = rowLevel.map { case (n, _) =>
      n -> head.getAs[Long](s"__v_$n") }.toMap
    val counts: Seq[(String, Long)] = rules.map {
      case Unique(n, cols0) =>
        // surplus rows beyond the first per duplicate key
        val dup = df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L))).head().getLong(0)
        n -> dup
      case RefIntegrity(n, c, dim, dimCol) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(dim.select(col(dimCol).as(c)).distinct(), Seq(c), "left_anti")
          .count()
        n -> orphans
      case r => r.name -> rowCounts(r.name)
    }
    counts.toDF("rule", "n_violations")
      .withColumn("n_rows", lit(nRows))
  }
}
