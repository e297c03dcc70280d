package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Cache LIFECYCLE for the engine's persisted intermediates (VERDICT
  * r8 #3): every `.cache()`/`.localCheckpoint()` an operator takes is
  * query-scoped working state, not a session-lifetime residency — at
  * 100 TB a leaked W×-token-count window cache or a stack of per-round
  * label checkpoints is executor memory some OTHER query needed.
  *
  * Two release surfaces:
  *  - [[releasePrevRound]] — inside an iterative operator (star
  *    contraction, LPA, PageRank): once round i+1's checkpoint is
  *    MATERIALIZED, round i's blocks are dead and drop immediately, so
  *    an iteration holds ≤ 2 round frames at any moment instead of
  *    O(rounds).
  *  - [[releaseAll]] — at a consumer boundary (Verify between queries,
  *    Bench between timed runs, a production job between pipeline
  *    stages): clears the SQL cache registry and unpersists every RDD
  *    still registered, including checkpoint blocks. Safe exactly when
  *    no live DataFrame from before the boundary is used after it —
  *    the contract a per-query driver loop satisfies by construction.
  *    Staged parquet artifacts (pair lineage, kNN edges, IVF indexes)
  *    and the bounded driver-side centroid/codebook caches are
  *    untouched: those are the deliberate cross-query amortizations.
  */
object CacheScope {

  /** Drop the checkpoint blocks backing `prev` — a frame returned by
    * `localCheckpoint()` whose successor round has already
    * materialized. No-op on a frame with no checkpointed leaves (the
    * round-0 input), so loops can call it unconditionally. Must NOT be
    * called on a frame that is still reachable from a live plan: a
    * localCheckpoint has no lineage to recompute from. */
  def releasePrevRound(prev: Dataset[_]): Unit =
    prev.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Barrier release: every cached plan and every persisted RDD
    * (checkpoint blocks included) goes. Cached-plan consumers that
    * somehow outlive the boundary recompute correctly (CacheManager
    * keeps lineage); checkpoint consumers must not outlive it. */
  def releaseAll(s: SparkSession): Unit = {
    s.sharedState.cacheManager.clearCache()
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // per-call tmp artifacts age out on the same boundary (ADVICE r9
    // #4) — see TmpDirs for the two-generation lifetime argument
    TmpDirs.sweep()
  }
}
