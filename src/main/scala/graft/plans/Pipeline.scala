package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative transfer pipeline — the Spark re-expression of the
  * reference's config-driven Transfer rule (reference: config.go:15
  * Transfer{Source,Target,Transformer,Filter,ContentEnricher,
  * VariableExtraction}; transfer.go:15 transferRecord).
  *
  * A `TransferSpec` is data, not code: the whole rule compiles to ONE
  * declarative DataFrame plan, so Catalyst sees through every stage —
  * filters push to the scan, enrich dims broadcast, routing keys are
  * plain columns feeding a dynamic-partitioned write. Registries of
  * named record callbacks (the reference's Go function registries)
  * become registries of named Column expressions.
  */
object Pipeline {

  /** Source formats mirroring reference Resource.DataFormat + dsc csv. */
  sealed trait Format
  case object Parquet extends Format
  case object NdJson extends Format
  case object Csv extends Format

  final case class SourceSpec(path: String, format: Format,
    schemaDdl: Option[String] = None)

  /** `<mod:N>` / `<dateFormat:fmt>` / field-extraction routing keys
    * (reference util.go:18-20, variable_provider.go). */
  sealed trait RouteKey { def name: String; def toColumn: Column }
  final case class ModKey(name: String, src: String, n: Int) extends RouteKey {
    def toColumn: Column = pmod(col(src), lit(n)).cast("int")
  }
  final case class DateKey(name: String, src: String, fmt: String) extends RouteKey {
    def toColumn: Column = date_format(col(src), fmt)
  }
  final case class ExtractKey(name: String, src: String, regex: String, group: Int)
      extends RouteKey {
    def toColumn: Column = regexp_extract(col(src), regex, group)
  }

  final case class EnrichSpec(dim: DataFrame, joinKey: (String, String),
    pick: Seq[(String, String)])

  final case class TransferSpec(
    source: SourceSpec,
    filterExpr: Option[String] = None,            // Filter registry analog
    transforms: Seq[(String, String)] = Nil,      // Transformer: name -> SQL expr
    enrich: Option[EnrichSpec] = None,            // ContentEnricher analog
    routes: Seq[RouteKey] = Nil,                  // VariableExtraction + target key
    select: Seq[String] = Nil)                    // final projection (Nil = all)

  def read(s: SparkSession, src: SourceSpec): DataFrame = {
    val r = s.read
    val withSchema = src.schemaDdl.map(r.schema).getOrElse(r)
    src.format match {
      case Parquet => withSchema.parquet(src.path)
      case NdJson  => withSchema.json(src.path)
      case Csv     => withSchema.option("header", "true").csv(src.path)
    }
  }

  /** Compile a TransferSpec to a single declarative plan. */
  def plan(s: SparkSession, spec: TransferSpec): DataFrame = {
    var df = read(s, spec.source)
    spec.filterExpr.foreach(f => df = df.filter(expr(f)))
    spec.transforms.foreach { case (name, e) => df = df.withColumn(name, expr(e)) }
    spec.enrich.foreach { en =>
      val (l, r) = en.joinKey
      val dim = en.dim.select((r +: en.pick.map(_._1)).distinct.map(col): _*)
      df = df.join(broadcast(dim), col(l) === col(r), "left")
      en.pick.foreach { case (from, to) => df = df.withColumnRenamed(from, to) }
      if (r != l) df = df.drop(r)
    }
    spec.routes.foreach(k => df = df.withColumn(k.name, k.toColumn))
    if (spec.select.nonEmpty) df.select(spec.select.map(col): _*) else df
  }

  /** Execute: plan → dynamic-partitioned target write (the reference's
    * per-target-key files become partition directories, written by one
    * distributed job). */
  def run(s: SparkSession, spec: TransferSpec, targetPath: String): Unit = {
    val df = plan(s, spec)
    val writer = df.write.mode("overwrite")
    (if (spec.routes.nonEmpty) writer.partitionBy(spec.routes.map(_.name): _*)
     else writer).parquet(targetPath)
  }
}
