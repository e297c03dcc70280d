package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test
  * JVM; re-creating sessions per-suite triples test wall time). */
object SharedSpark {
  lazy val spark: SparkSession = {
    // GraftSession wiring → the extensions (functions + optimizer rule)
    // are active in every suite
    val s = GraftSession.builder(appName = "graft-test", master = Some("local[4]"),
        shufflePartitions = 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
