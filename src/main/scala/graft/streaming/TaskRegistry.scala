package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryStartedEvent, QueryProgressEvent, QueryTerminatedEvent}
import java.util.UUID
import scala.collection.concurrent.TrieMap

/** Task/status registry — the reference's REST status surface
  * (reference server.go:20, service.go:32-263: Status, GetTasksList,
  * ProcessingStatus, GetErrors; task_registry.go) re-expressed as a
  * StreamingQueryListener: every scheduled transfer registers itself by
  * running, status transitions ride Spark's listener bus (no polling,
  * no mutexed counters in user code), and the registry answers the same
  * queries the reference's HTTP endpoints serve.
  */
object TaskRegistry {

  /** Terminal-history cap shared by both registries (reference
    * task_registry.go:8). */
  val MaxHistory = 20

  sealed trait State
  case object Running extends State
  case object Finished extends State
  final case class Failed(error: String) extends State

  final case class TaskStatus(
    name: String,
    id: UUID,
    state: State,
    batches: Long,
    rowsProcessed: Long,
    lastProgressMs: Long)

  final class Listener extends StreamingQueryListener {
    private val tasks = TrieMap.empty[UUID, TaskStatus]

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      tasks.put(e.id, TaskStatus(Option(e.name).getOrElse(e.id.toString),
        e.id, Running, 0L, 0L, System.currentTimeMillis()))

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      tasks.updateWith(p.id) {
        case Some(t) => Some(t.copy(
          batches = t.batches + 1,
          rowsProcessed = t.rowsProcessed + p.numInputRows,
          lastProgressMs = System.currentTimeMillis()))
        case None => Some(TaskStatus(Option(p.name).getOrElse(p.id.toString),
          p.id, Running, 1L, p.numInputRows, System.currentTimeMillis()))
      }
    }

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      tasks.updateWith(e.id) {
        // stamp the TERMINATION time: eviction ages terminal entries by
        // lastProgressMs, and a long-idle query that fails NOW must not
        // sort older than entries that finished an hour ago (its Failed
        // error is exactly what errors() exists to surface)
        case Some(t) => Some(t.copy(
          state = e.exception.map(Failed(_): State).getOrElse(Finished),
          lastProgressMs = System.currentTimeMillis()))
        case None => None
      }
      evictTerminal()
    }

    /** Bounded terminal-task history (reference task_registry.go:8
      * MaxHistory): Running queries are never evicted; beyond
      * MaxHistory terminal entries the oldest by termination time roll
      * off — the listener's map stays bounded across an unbounded
      * stream of scheduled transfers. */
    private def evictTerminal(): Unit = {
      val terminal = tasks.values.filter(_.state != Running).toSeq
      if (terminal.size > TaskRegistry.MaxHistory)
        terminal.sortBy(t => (t.lastProgressMs, t.name))
          .dropRight(TaskRegistry.MaxHistory)
          // conditional remove: a query id that re-registered as
          // Running (checkpoint restart) between snapshot and here
          // must survive — only the snapshotted terminal value goes
          .foreach(t => tasks.remove(t.id, t))
    }

    /** Test seam: inject a task row directly (the listener events have
      * private[sql] constructors) and apply the same terminal-history
      * eviction a real termination triggers. */
    private[graft] def record(t: TaskStatus): Unit = {
      tasks.put(t.id, t)
      if (t.state != Running) evictTerminal()
    }

    /** service.go GetTasksList analog. */
    def tasksList(): Seq[TaskStatus] = tasks.values.toSeq.sortBy(_.name)

    /** service.go Status analog (single task by name). */
    def status(name: String): Option[TaskStatus] =
      tasks.values.find(_.name == name)

    /** service.go GetErrors analog. */
    def errors(): Seq[(String, String)] = tasks.values.collect {
      case TaskStatus(n, _, Failed(err), _, _, _) => n -> err
    }.toSeq
  }
}
