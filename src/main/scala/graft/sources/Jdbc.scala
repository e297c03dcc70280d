package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC datastore source/target — the Spark analog of the reference's
  * `datastore` source type and database-target package (reference:
  * config.go:115 Source.Type "datastore"; pkg/bigquery/big_query.go
  * load-job + post-load verification). Spark's JDBC relation provider
  * gives predicate pushdown and partitioned parallel reads for free;
  * the embedded Apache Derby engine (already on Spark's classpath for
  * the Hive metastore) stands in for the external warehouse in tests.
  *
  * Load contract, mirroring the reference's load semantics:
  *  - schema-mapped write (explicit target column DDL);
  *  - idempotent: `overwrite` + truncate — a retried load converges to
  *    the same table state instead of appending duplicates;
  *  - post-load verification: the loaded row count must equal the
  *    source count, else the transfer FAILS (big_query.go checks the
  *    job's output rows the same way).
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  /** Embedded single-JVM database under `dbDir` (created on demand).
    * Paths are pid-scoped by callers so concurrent suites don't fight
    * over Derby's db.lck. */
  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  /** Idempotent schema-mapped load + post-load verify. The expected
    * count rides the write job via observe() — the source lineage is
    * computed exactly once per load, and only the (cheap) JDBC
    * read-back count is an extra job.
    *
    * Batch knobs (reference config.go:117 Source.BatchSize /
    * config.go:135 Target.MaxAllowedSize — rows per load batch):
    *  - `batchSize` → JDBC `batchsize`: rows per executeBatch round
    *    trip on each writer task (Spark default 1000 — too small for a
    *    warehouse bulk load, where 10-100k amortizes the round trip);
    *  - `numPartitions` → coalesce before the write: each partition is
    *    one JDBC connection, so this caps concurrent connections
    *    against the target database (at 1000 executors an uncapped
    *    write is a 1000-connection storm). */
  def load(df: DataFrame, url: String, table: String,
      columnTypes: Option[String] = None,
      batchSize: Option[Int] = None,
      numPartitions: Option[Int] = None): Unit = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    // connection cap via our own coalesce, NOT the writer's
    // numPartitions option: Spark's JDBC writer implements that option
    // through df.rdd + coalesce, which re-plans the query outside the
    // observed execution — the Observation would report 0 rows and the
    // post-load verify would spuriously fail.
    val input = numPartitions.map(observed.coalesce).getOrElse(observed)
    val w = input.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", DerbyDriver)
      .option("truncate", "true")
      .mode("overwrite")
    columnTypes.foreach(w.option("createTableColumnTypes", _))
    batchSize.foreach(b => w.option("batchsize", b.toString))
    w.save()
    val expected = obs.get("n").asInstanceOf[Long]
    val loaded = read(df.sparkSession, url, table).count()
    if (loaded != expected) throw new IllegalStateException(
      s"post-load verify failed for $table: loaded $loaded, expected $expected")
  }

  /** JDBC read; with a partition column the scan parallelizes across
    * `numPartitions` range predicates (the 100 TB read path against a
    * real warehouse — each executor pulls one slice). */
  /** `fetchSize` is the read-side BatchSize analog: rows per JDBC
    * fetch round trip (driver defaults are tiny — e.g. 10 for Oracle). */
  def read(s: SparkSession, url: String, table: String,
      partitionCol: Option[(String, Long, Long, Int)] = None,
      fetchSize: Option[Int] = None): DataFrame = {
    val r = s.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("driver", DerbyDriver)
    partitionCol.foreach { case (c, lo, hi, n) =>
      r.option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }
    fetchSize.foreach(f => r.option("fetchsize", f.toString))
    r.load()
  }
}
