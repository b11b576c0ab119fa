package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.tsdb.{GraftDb, VType}

/** HTTP query endpoint — parity with the reference web backend
  * (tachyon_web_backend/src/main.rs:10-90):
  *
  *   GET  /health  -> 200, empty body
  *   POST /query   -> {"path", "query", "start"?, "end"?}
  *                 -> {"value_type", "timestamps",
  *                     "values_u64"|"values_i64"|"values_f64"}
  *
  * Exactly one `values_*` array is non-null, selected by the query's
  * value type (main.rs:18-24, 55-76); absent start/end default to the
  * same full-range constants as the CLI; errors map to 400 with the
  * message as the body (main.rs:31-35). Scalar query results (which the
  * reference endpoint never materializes — it only drains next_vector)
  * are returned as values with an empty `timestamps`.
  *
  * One JVM/SparkSession serves many databases: `path` picks the GraftDb
  * root per request, like the reference's per-request Connection.
  */
object Web {

  /** Usage: Web [port] [dbRoot]. Binds loopback only; databases are
    * restricted to `dbRoot` (default: the working directory) — an open
    * `path` field from the network must not grant arbitrary filesystem
    * reads or directory creation.
    */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val root = args.lift(1).getOrElse(System.getProperty("user.dir"))
    val spark = graft.engine.Graft.session("graft-web")
    val server = start(spark, port, Some(root))
    println(s"graft web backend listening on 127.0.0.1:${server.getAddress.getPort}" +
      s" (db root: $root)")
    // block forever; the server threads own the process from here
    Thread.currentThread().join()
  }

  /** Start a server on `port` (0 = ephemeral), loopback-bound. When
    * `dbRoot` is set, /query only opens databases under it; /compact
    * (a destructive, file-rewriting operation) REFUSES to run at all
    * unless a `dbRoot` is configured. Caller stops it.
    */
  def start(spark: SparkSession, port: Int,
      dbRoot: Option[String] = None): HttpServer = {
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port), 0)
    server.createContext("/health", (ex: HttpExchange) => {
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    // one copy of the POST-only / 400-on-error / JSON plumbing
    def jsonContext(path: String)(handler: String => String): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val (code, body) =
          try {
            if (ex.getRequestMethod != "POST") (405, "POST only")
            else (200, handler(new String(
              ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)))
          } catch {
            case e: Exception => (400, Option(e.getMessage).getOrElse("bad request"))
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type",
          if (code == 200) "application/json" else "text/plain")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    jsonContext("/query")(handleQuery(spark, _, dbRoot))
    // maintenance (beyond the reference backend): merge flush deltas.
    // POST {"path", "max_files"?} -> {"compacted_partitions": n}.
    // Deletes files, so it is gated on an explicit allowlist — a server
    // started without one only exposes reads.
    jsonContext("/compact") { body =>
      if (dbRoot.isEmpty)
        throw new IllegalArgumentException(
          "compaction disabled: server started without a db root allowlist")
      handleCompact(spark, body, dbRoot)
    }
    // retention: POST {"path", "before_ms"} -> {"expired_partitions": n}.
    // Same delete-gated allowlist rule as /compact.
    jsonContext("/expire") { body =>
      if (dbRoot.isEmpty)
        throw new IllegalArgumentException(
          "retention disabled: server started without a db root allowlist")
      handleExpire(spark, body, dbRoot)
    }
    // stream deletion: POST {"path", "selector"} -> {"deleted": selector}.
    // Same delete-gated allowlist rule as /compact and /expire.
    jsonContext("/delete-stream") { body =>
      if (dbRoot.isEmpty)
        throw new IllegalArgumentException(
          "deletion disabled: server started without a db root allowlist")
      handleDeleteStream(spark, body, dbRoot)
    }
    server.setExecutor(null)
    server.start()
    server
  }

  private[tools] def handleCompact(spark: SparkSession, requestJson: String,
      dbRoot: Option[String]): String = {
    val mapper = new ObjectMapper()
    val req = mapper.readTree(requestJson)
    def field(k: String) = Option(req.get(k)).filterNot(_.isNull)
    val path = allowedPath(req, dbRoot)
    val maxFiles = field("max_files").map(_.asInt()).getOrElse(4)
    val n = new GraftDb(spark, path).compact(maxFiles)
    val root = mapper.createObjectNode()
    root.put("compacted_partitions", n)
    mapper.writeValueAsString(root)
  }

  private[tools] def handleDeleteStream(spark: SparkSession,
      requestJson: String, dbRoot: Option[String]): String = {
    val mapper = new ObjectMapper()
    val req = mapper.readTree(requestJson)
    val path = allowedPath(req, dbRoot)
    val selector = Option(req.get("selector")).filterNot(_.isNull)
      .map(_.asText())
      .getOrElse(throw new IllegalArgumentException("missing field: selector"))
    new GraftDb(spark, path).deleteStream(selector)
    val root = mapper.createObjectNode()
    root.put("deleted", selector)
    mapper.writeValueAsString(root)
  }

  private[tools] def handleExpire(spark: SparkSession, requestJson: String,
      dbRoot: Option[String]): String = {
    val mapper = new ObjectMapper()
    val req = mapper.readTree(requestJson)
    val path = allowedPath(req, dbRoot)
    val beforeMs = Option(req.get("before_ms")).filterNot(_.isNull)
      .map(_.asLong())
      .getOrElse(throw new IllegalArgumentException("missing field: before_ms"))
    val n = new GraftDb(spark, path).expire(beforeMs)
    val root = mapper.createObjectNode()
    root.put("expired_partitions", n)
    mapper.writeValueAsString(root)
  }

  /** The request's `path` field, rejected unless it resolves under the
    * configured db root (no arbitrary filesystem access from the
    * network).
    */
  private def allowedPath(req: com.fasterxml.jackson.databind.JsonNode,
      dbRoot: Option[String]): String = {
    val path = Option(req.get("path")).filterNot(_.isNull).map(_.asText())
      .getOrElse(throw new IllegalArgumentException("missing field: path"))
    dbRoot.foreach { root =>
      val canonical = java.nio.file.Paths.get(root).toAbsolutePath.normalize
      val requested = java.nio.file.Paths.get(path).toAbsolutePath.normalize
      if (!requested.startsWith(canonical))
        throw new IllegalArgumentException(s"path outside db root: $path")
    }
    path
  }

  private[tools] def handleQuery(spark: SparkSession, requestJson: String,
      dbRoot: Option[String] = None): String = {
    val mapper = new ObjectMapper()
    val req = mapper.readTree(requestJson)
    def field(k: String) = Option(req.get(k)).filterNot(_.isNull)
    val path = allowedPath(req, dbRoot)
    val promql = field("query").map(_.asText())
      .getOrElse(throw new IllegalArgumentException("missing field: query"))
    val start = field("start").map(_.asLong()).getOrElse(Cli.HackTimeStart)
    val end = field("end").map(_.asLong()).getOrElse(Cli.HackTimeEnd)

    // Optional "step" switches to Prometheus query_range evaluation:
    // the range function slides over (T - range, T] at each step instead
    // of the one-pass tumbling shape (GraftDb.queryRange contract).
    val db = new GraftDb(spark, path)

    // Optional "by" (a JSON array of label names, or one comma-separated
    // string) makes the step query GROUPED — every label tuple's own
    // series at each step (GraftDb.queryRangeBy; the CLI's
    // `query-range-by` twin). Whole-range grouped queries don't need
    // the field: write the by-clause in the PromQL text.
    field("by") match {
      case None => ()
      case Some(n) =>
        val ls: List[String] =
          if (n.isArray) {
            val it = n.elements(); val b = List.newBuilder[String]
            while (it.hasNext) b += it.next().asText()
            b.result()
          } else n.asText().split(',').map(_.trim).filter(_.nonEmpty).toList
        val step = field("step").map(_.asLong()).getOrElse(
          throw new IllegalArgumentException(
            "\"by\" requires \"step\" (it selects grouped query_range " +
              "evaluation); for whole-range grouped queries put the " +
              "by-clause in the PromQL text instead"))
        val df = db.queryRangeBy(promql,
          graft.tsdb.Expr.Grouping(by = true, ls), start, end, step)
        val cols = df.columns
        val root = mapper.createObjectNode()
        root.put("value_type", "Float64")
        val arr = root.putArray("groups")
        df.orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().foreach { r =>
            val o = arr.addObject()
            cols.dropRight(2).zipWithIndex.foreach { case (c, i) =>
              if (r.isNullAt(i)) o.putNull(c) else o.put(c, r.get(i).toString)
            }
            o.put("timestamp", r.getLong(cols.length - 2))
            if (r.isNullAt(cols.length - 1)) o.putNull("value")
            else o.put("value", r.getDouble(cols.length - 1))
          }
        return mapper.writeValueAsString(root)
    }

    val res = field("step").map(_.asLong()) match {
      case Some(step) => db.queryRange(promql, start, end, step)
      case None => db.query(promql, start, end)
    }
    if (res.grouped) {
      // by/without result: a `groups` array of {label..: value..,
      // value: n} objects, ordered by the group keys — the reference
      // endpoint has no analogue (its planner drops grouping)
      val cols = res.output.columns
      val root = mapper.createObjectNode()
      root.put("value_type", "Float64")
      val arr = root.putArray("groups")
      res.output
        .orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().foreach { r =>
          val o = arr.addObject()
          cols.init.zipWithIndex.foreach { case (c, i) =>
            if (r.isNullAt(i)) o.putNull(c) else o.put(c, r.get(i).toString)
          }
          // NULL value cell (Spark's divide-by-zero rule for a
          // zero-denominator group) renders as JSON null, not NPE
          if (r.isNullAt(cols.length - 1)) o.putNull("value")
          else o.put("value", r.getDouble(cols.length - 1))
        }
      return mapper.writeValueAsString(root)
    }
    val rows =
      if (res.isScalar) res.output.collect().map(r => (None: Option[Long], r.get(0)))
      else res.output.orderBy("timestamp").collect()
        .map(r => (Some(r.getLong(0)), r.get(1)))

    val root = mapper.createObjectNode()
    root.put("value_type", res.vtype match {
      case VType.I64 => "Integer64"
      case VType.U64 => "UInteger64"
      case VType.F64 => "Float64"
    })
    val ts = root.putArray("timestamps")
    rows.foreach { case (t, _) => t.foreach(ts.add) }
    val (u64, i64, f64) = ("values_u64", "values_i64", "values_f64")
    val valueKey = res.vtype match {
      case VType.I64 => i64
      case VType.U64 => u64
      case VType.F64 => f64
    }
    Seq(u64, i64, f64).filterNot(_ == valueKey).foreach(root.putNull)
    val vs = root.putArray(valueKey)
    rows.foreach {
      case (_, v: java.lang.Long) => vs.add(v.longValue())
      case (_, v: java.lang.Double) =>
        if (res.vtype == VType.F64) vs.add(v.doubleValue()) else vs.add(v.longValue())
      case (_, v) => throw new IllegalStateException(s"unexpected value $v")
    }
    mapper.writeValueAsString(root)
  }
}
