package graft

/** Generation-scoped janitor for PER-CALL gate artifacts (ADVICE r9
  * #4): streaming gates stage sources/checkpoints/append deltas under
  * fresh nanoTime tmp dirs every invocation, and a bench sweep (reps ×
  * gates) previously accumulated an unbounded pile of them. Gates
  * register their per-call dirs here; [[CacheScope.releaseAll]] sweeps
  * at every consumer boundary, deleting dirs registered before the
  * PREVIOUS boundary — so a dir outlives its own query plus exactly
  * one more (the returned DataFrame is always consumed within its own
  * boundary; the extra generation is safety margin), and disk usage is
  * bounded at ~2 generations regardless of sweep length.
  *
  * Session-staged VERSIONED artifacts (pair lineage, kNN edges, the
  * persisted indexes) never register: amortizing those across queries
  * is the deliberate production contract.
  */
object TmpDirs {
  private val gen = new java.util.concurrent.atomic.AtomicLong
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
  // register/unregister/sweep share ONE monitor (ADVICE r11 #2), but
  // the monitor no longer spans the filesystem deletes (ADVICE r12
  // #4): sweep DEQUEUES the doomed entries and records them in
  // `inFlight` under the lock, then rm's outside it — register and
  // unregister of unrelated paths never block on a slow delete. The
  // r11 #2 flip-back race (unregister returns while a sweep is still
  // rm'ing that very path, and the rebuild writes into a directory
  // being deleted) stays closed by the in-flight set: unregister WAITS
  // until its specific path has no delete in flight before returning.
  private val lock = new Object
  // in-flight delete REFCOUNT per path (ADVICE r13 #1): a Set loses
  // multiplicity when the same path holds two queue entries (or two
  // sweeps overlap on it) — the first completed rm would remove the
  // membership and wake unregister while a second delete of that very
  // path is still running. Decrement per completed rm; wake at zero.
  private val inFlight = scala.collection.mutable.Map.empty[String, Int]
  // bounded unregister wait (ADVICE r13 #1): a sweep thread dying
  // between the dequeue and its per-path cleanup would otherwise park
  // unregister forever; fail loudly instead of hanging the rebuild.
  // PROGRESS-AWARE (ADVICE r14 #2): a healthy rm of a very large
  // per-call directory can legitimately exceed any fixed deadline, so
  // the timeout fires only when no delete progress is observed for a
  // full window — [[rm]] heartbeats once per filesystem entry it
  // removes on THE AWAITED PATH's own counter (see pathBeats below),
  // and unregister resets its deadline only when that counter
  // advances. A dead sweep thread stops heartbeating and still fails
  // loudly within one window even while other deletes progress.
  private val UnregisterWaitMs = 120000L
  // heartbeats are PER PATH (ADVICE r15 #3): a single global counter
  // let progress by any sweep thread on any OTHER path reset a
  // waiter's no-progress deadline — if the thread deleting the awaited
  // path died while unrelated deletes kept progressing, the bounded
  // wait regressed to an indefinite hang. Each in-flight path gets its
  // own counter, bumped once per filesystem entry removed from THAT
  // path's tree; unregister extends its deadline only when the awaited
  // path's own counter advances. Entries are created under the sweep
  // monitor alongside the refcount and removed when it reaches zero.
  private val pathBeats = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]
  private def beatOf(path: String): Long = {
    val b = pathBeats.get(path)
    if (b == null) 0L else b.get()
  }

  /** Mark a per-call directory for deferred deletion. */
  def register(path: String): Unit =
    lock.synchronized { dirs.add((gen.get(), path)); () }

  /** Cancel any pending registration for `path` — called before a
    * staged-artifact REBUILD into a deterministic path (ADVICE r10
    * #1): a version flip-back (A→B→A) re-stages into the SAME
    * pid+md5(vkey) dir that the A→B supersession queued for deferred
    * deletion, and the stale registration would delete the live,
    * memoized artifact within two sweep boundaries. Runs under the
    * sweep monitor, so it is race-free against an in-flight sweep. */
  def unregister(path: String): Unit = lock.synchronized {
    val it = dirs.iterator()
    while (it.hasNext) if (it.next()._2 == path) it.remove()
    // a sweep may have already dequeued this path and be rm'ing it
    // right now — returning early would let the rebuild write into a
    // directory being deleted (the ADVICE r11 #2 race)
    var lastBeat = beatOf(path)
    var deadline = System.nanoTime() + UnregisterWaitMs * 1000000L
    while (inFlight.getOrElse(path, 0) > 0) {
      val beat = beatOf(path)
      if (beat != lastBeat) { // THIS path's delete is advancing: reset
        lastBeat = beat
        deadline = System.nanoTime() + UnregisterWaitMs * 1000000L
      }
      val leftMs = (deadline - System.nanoTime()) / 1000000L
      if (leftMs <= 0) throw new IllegalStateException(
        s"TmpDirs.unregister: delete of $path still in flight with no " +
          s"progress for ${UnregisterWaitMs}ms — a sweep thread likely " +
          "died mid-delete")
      // wake periodically even without a notify: a long rm of this
      // path's large tree heartbeats per entry without completing, and
      // the waiter must observe that progress to extend its deadline
      lock.wait(math.min(leftMs, 5000L))
    }
  }

  private def rm(beat: java.util.concurrent.atomic.AtomicLong)(
      f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm(beat))
    f.delete()
    beat.incrementAndGet(); ()
  }

  /** Boundary sweep: delete everything registered before the previous
    * sweep, then open a new generation. Idempotent on missing paths.
    * Drain-then-delete: the deletable entries dequeue into the
    * in-flight set atomically under the monitor, the rm's run outside
    * it, and completion notifies any unregister waiting on a specific
    * path. */
  private[graft] def sweep(): Unit = {
    val doomed = lock.synchronized {
      val g = gen.getAndIncrement()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = dirs.iterator()
      while (it.hasNext) {
        val (dg, p) = it.next()
        if (dg < g) { it.remove(); out += p }
      }
      out.foreach { p =>
        inFlight(p) = inFlight.getOrElse(p, 0) + 1
        pathBeats.computeIfAbsent(p,
          _ => new java.util.concurrent.atomic.AtomicLong)
      }
      out
    }
    doomed.foreach { p =>
      val beat = pathBeats.get(p) // created under the monitor above
      try rm(beat)(new java.io.File(p)) catch { case _: Throwable => () }
      finally lock.synchronized {
        val left = inFlight.getOrElse(p, 1) - 1
        if (left <= 0) { inFlight -= p; pathBeats.remove(p) }
        else inFlight(p) = left
        lock.notifyAll()
      }
    }
  }
}
