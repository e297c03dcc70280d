package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Staged-artifact staleness (VERDICT r8 #4): session-lifetime staged
  * caches key on the corpus CONTENT VERSION, so mutating a corpus
  * under the same path within one session rebuilds the artifact
  * instead of silently serving the stale one.
  */
class StagedVersionSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("re-staged corpus under the same path rebuilds the staged kNN graph") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ver_${System.nanoTime}"
    Tables.embeddings(spark, sf).write.parquet(s"$base/embeddings.parquet")
    val v1 = Tables.snapshot(spark, base, "embeddings")
    val n1 = graft.operators.Similarity.knnGraphLineage(spark, base).count()
    // corpus RE-STAGED in place: half the vectors, same directory
    Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    assert(Tables.snapshot(spark, base, "embeddings") != v1,
      "snapshot fingerprint must change when the table is rewritten")
    val n2 = graft.operators.Similarity.knnGraphLineage(spark, base).count()
    // truth: the memo-free recompute twin over the CURRENT corpus
    val fresh = graft.operators.Similarity.knnGraph(spark, base).count()
    assert(n2 == fresh, s"staged graph served $n2 edges, fresh corpus has $fresh — stale artifact")
    assert(n2 != n1, "mutated corpus must not serve the old snapshot's graph")
    CacheScope.releaseAll(spark)
  }

  test("snapshot fingerprint is stable across repeated listings") {
    val a = Tables.snapshot(spark, sf, "embeddings")
    val b = Tables.snapshot(spark, sf, "embeddings")
    assert(a == b, "an untouched corpus must keep its fingerprint (no spurious rebuilds)")
  }
}
