package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import graft.plans.Pipeline.BatchTasks

/** REST status endpoint — the reference's operational HTTP surface
  * (reference server.go:26-108: GET /etly/tasklist, /etly/status,
  * /etly/errors, /etly/info/{name}, /etly/version;
  * service_contract.go, status_info_response.go) served over the JDK's
  * built-in HttpServer, no extra dependencies.
  *
  * The registries stay the single source of truth — the streaming
  * TaskRegistry listener rides Spark's listener bus and BatchTasks is
  * updated by every runWithRetry/runAll — this class only serializes
  * them. Driver-side and O(#tasks): nothing here touches executors or
  * data, so the endpoint costs the same at sf0.001 and 100 TB.
  */
final class StatusServer(listener: TaskRegistry.Listener, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def streamTaskJson(t: TaskRegistry.TaskStatus): String = {
    val state = t.state match {
      case TaskRegistry.Running   => "RUNNING"
      case TaskRegistry.Finished  => "FINISHED"
      case TaskRegistry.Failed(_) => "FAILED"
    }
    s"""{"name":"${esc(t.name)}","kind":"stream","state":"$state",""" +
      s""""batches":${t.batches},"rowsProcessed":${t.rowsProcessed},""" +
      s""""lastProgressMs":${t.lastProgressMs}}"""
  }

  private def batchTaskJson(t: BatchTasks.Status): String = {
    val (state, extra) = t.state match {
      case BatchTasks.Running => ("RUNNING", "")
      case BatchTasks.Finished(rows, errs, att) =>
        ("FINISHED", s""","rowsWritten":$rows,"errorRows":$errs,"attempts":$att""")
      case BatchTasks.Failed(e, att) =>
        ("FAILED", s""","error":"${esc(e)}","attempts":$att""")
    }
    s"""{"name":"${esc(t.target)}","kind":"batch","state":"$state",""" +
      s""""startedMs":${t.startedMs},"updatedMs":${t.updatedMs}$extra}"""
  }

  /** GET /graft/tasklist[?status=running|finished|failed] —
    * GetTasksList analog (both registries). The optional state filter
    * mirrors the reference's task-list `status` query parameter
    * (reference server.go:71 `Parameters: []string{"status"}`; README
    * `/etly/tasks?status=DONE`); matching is case-insensitive. */
  private def tasklistJson(statusFilter: Option[String]): String = {
    def streamState(t: TaskRegistry.TaskStatus): String = t.state match {
      case TaskRegistry.Running   => "RUNNING"
      case TaskRegistry.Finished  => "FINISHED"
      case TaskRegistry.Failed(_) => "FAILED"
    }
    def batchState(t: BatchTasks.Status): String = t.state match {
      case BatchTasks.Running        => "RUNNING"
      case _: BatchTasks.Finished    => "FINISHED"
      case _: BatchTasks.Failed      => "FAILED"
    }
    val want = statusFilter.map(_.toUpperCase)
    def keep(state: String): Boolean = want.forall(_ == state)
    (listener.tasksList().filter(t => keep(streamState(t))).map(streamTaskJson) ++
      BatchTasks.tasksList().filter(t => keep(batchState(t))).map(batchTaskJson))
      .mkString("[", ",", "]")
  }

  /** Parse a query string's `status` parameter (no full query-parser
    * dependency; the endpoint takes exactly one optional parameter). */
  private def statusParam(x: HttpExchange): Option[String] =
    Option(x.getRequestURI.getQuery).flatMap(_.split('&').collectFirst {
      case kv if kv.takeWhile(_ != '=') == "status" =>
        java.net.URLDecoder.decode(kv.dropWhile(_ != '=').drop(1), "UTF-8")
    }).filter(_.nonEmpty)

  /** GET /graft/errors — GetErrors analog. */
  private def errorsJson: String =
    (listener.errors() ++ BatchTasks.errors())
      .map { case (n, e) => s"""{"name":"${esc(n)}","error":"${esc(e)}"}""" }
      .mkString("[", ",", "]")

  /** GET /graft/status — Status analog: overall health roll-up. */
  private def statusJson: String = {
    val nErr = listener.errors().size + BatchTasks.errors().size
    val running = listener.tasksList().count(_.state == TaskRegistry.Running) +
      BatchTasks.tasksList().count(_.state == BatchTasks.Running)
    val n = listener.tasksList().size + BatchTasks.tasksList().size
    val overall = if (nErr > 0) "ERROR" else "OK"
    s"""{"status":"$overall","tasks":$n,"running":$running,"errors":$nErr}"""
  }

  /** GET /graft/info/{name} — ProcessingStatus analog (single task). */
  private def infoJson(name: String): Option[String] =
    listener.status(name).map(streamTaskJson)
      .orElse(BatchTasks.status(name).map(batchTaskJson))

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/graft/", (x: HttpExchange) =>
    try {
      val path = x.getRequestURI.getPath
      if (x.getRequestMethod != "GET")
        respond(x, 405, """{"error":"method not allowed"}""")
      else path match {
        case "/graft/tasklist" | "/graft/tasklist/" =>
          respond(x, 200, tasklistJson(statusParam(x)))
        case "/graft/status"  => respond(x, 200, statusJson)
        case "/graft/errors"  => respond(x, 200, errorsJson)
        case "/graft/version" =>
          respond(x, 200, s"""{"version":"${StatusServer.Version}"}""")
        case p if p.startsWith("/graft/info/") =>
          val name = java.net.URLDecoder.decode(p.stripPrefix("/graft/info/"), "UTF-8")
          infoJson(name) match {
            case Some(j) => respond(x, 200, j)
            case None    => respond(x, 404, s"""{"error":"no task named ${esc(name)}"}""")
          }
        case _ => respond(x, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: Throwable =>
        respond(x, 500, s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
    })
  server.setExecutor(null) // serve on the dispatch thread; status traffic is tiny

  /** Start serving; returns the bound port (pass port=0 for ephemeral). */
  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
}

object StatusServer {
  val Version = "0.3.0"
}
