package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated TPC-H-ish star schema
  * (see /root/repo/TESTDATA.md). Mirrors the reference's typed message
  * providers (reference: message_provider.go, config.go:102 DataType) —
  * in Spark the "provider" is just the parquet schema, and column
  * pruning / filter pushdown happen automatically at the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts has shipped in three parquet vintages: TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects — read nanos as long via
    * the legacy conf and truncate to microsecond TimestampType, the
    * same truncation DuckDB applies), TIMESTAMP(MICROS, adjustedToUTC)
    * that reads as TimestampType directly, and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) that reads as TIMESTAMP_NTZ. Dispatch on
    * the read type so every vintage normalizes to TimestampType — the
    * session timezone is pinned to UTC (GraftSession), so the NTZ cast
    * is wall-clock-preserving and hash-matches DuckDB's naive micros.
    * `div` (integer division) is required in the nanos branch: nanos
    * ~1.7e18 exceed a double's exact integer range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** documents fanned out across the cluster: the table is a single
    * small parquet file (1 input split), which would serialize
    * compute-dense per-doc ops (signatures, shingles, n-grams) onto one
    * core. At 100 TB real file splits give this for free. */
  def documentsParallel(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** embeddings fanned out — same single-input-split concern as
    * documentsParallel, for the vector-math-dense ops. */
  def embeddingsParallel(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).repartition(s.sparkContext.defaultParallelism)

  /** Register every table as a temp view so the whole surface is
    * reachable from `spark.sql(...)` — the user-facing form of the
    * reference's `datastore` SQL sources (any SQL text over the
    * registered schema goes through Catalyst like the DataFrame API). */
  def registerAll(s: SparkSession, d: String): Unit =
    all.foreach { name =>
      val df = if (name == "events") events(s, d) else load(s, d, name)
      df.createOrReplaceTempView(name)
    }
}
