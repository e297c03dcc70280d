package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache lifecycle (VERDICT r8 #3): persisted intermediates are
  * query-scoped, not session-lifetime — the boundary release leaves
  * ZERO persisted RDDs behind, iterative operators hold O(1) round
  * frames instead of O(rounds), and a release is never destructive
  * (the next run rebuilds and matches).
  */
class CacheLifecycleSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  test("boundary release leaves no persisted RDDs after cache-heavy gates") {
    // cache()-heavy (substring windows, minhash sigs), checkpoint-heavy
    // (star contraction), and mixed (pagerank rounds) gates
    val counts = Seq("dedup_substring", "dedup_minhash_lsh",
        "dedup_components", "sim_pagerank").map { name =>
      name -> SparkEntry.queries(name)(spark, sf).count()
    }
    counts.foreach { case (n, c) => assert(c > 0, s"$n returned no rows") }
    CacheScope.releaseAll(spark)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"persisted RDDs survived the boundary: ${leaked.keys.toSeq.sorted}")
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached plans survived the boundary")
    // the release must not be destructive: the same gates rebuild and
    // agree with the pre-release row counts
    counts.foreach { case (name, c) =>
      assert(SparkEntry.queries(name)(spark, sf).count() == c,
        s"$name changed after a boundary release")
    }
    CacheScope.releaseAll(spark)
  }

  test("star contraction holds O(1) round frames, not O(rounds)") {
    CacheScope.releaseAll(spark)
    val labels = graft.operators.Dedup.components(spark, sf)
    assert(labels.count() > 0)
    // by the time the labels materialize, every superseded round's
    // checkpoint has been dropped — what remains is the final edge
    // frame plus the operator's pair/member caches, a constant set
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted <= 8,
      s"contraction left $persisted persisted RDDs — per-round frames leaking")
    CacheScope.releaseAll(spark)
  }

  test("iterative label/rank rounds drop superseded checkpoints") {
    CacheScope.releaseAll(spark)
    val pr = graft.operators.Similarity.pagerank(spark, sf)
    assert(pr.count() > 0)
    val persisted = spark.sparkContext.getPersistentRDDs.size
    // expected residents: the staged/checkpointed edge list + the
    // final rank frame (+ the contraction caches its grap build took)
    assert(persisted <= 8,
      s"pagerank left $persisted persisted RDDs — per-round frames leaking")
    CacheScope.releaseAll(spark)
  }
}
