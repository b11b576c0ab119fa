package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.tsdb.{Expr, GraftDb, PromParser, VType}

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
    // recording rule: POST {"path", "target", "query", "start", "end",
    // "step"?} -> {"recorded": n, "target": t}. Writes to the store, so
    // the same allowlist gate as the other mutating endpoints.
    jsonContext("/record") { body =>
      if (dbRoot.isEmpty)
        throw new IllegalArgumentException(
          "recording disabled: server started without a db root allowlist")
      handleRecord(spark, body, dbRoot)
    }
    // Prometheus HTTP API bridge: GET or form-encoded POST, success/
    // error envelopes and matrix/vector/scalar result shapes per the
    // published API (prometheus.io/docs/prometheus/latest/querying/api).
    // One deviation, documented: a `path` param picks the database
    // (Prometheus serves one store; this server serves a root of them)
    // — it defaults to the configured db root itself.
    // handler gets (request path, multi-valued params) — the path
    // matters to the one endpoint whose operand rides in it
    def promRawContext(path: String)(
        handler: (String, Map[String, List[String]]) => String): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val (code, body) =
          try {
            val raw = ex.getRequestMethod match {
              case "GET" => Option(ex.getRequestURI.getRawQuery).getOrElse("")
              case "POST" => new String(
                ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              case _ => throw new IllegalArgumentException("GET or POST only")
            }
            (200, handler(ex.getRequestURI.getPath, promParseParams(raw)))
          } catch {
            case e: Exception => (400, promErrorBody(e))
          }
        promRespond(ex, code, body)
      })
    def promContext(path: String)(
        handler: Map[String, List[String]] => String): Unit =
      promRawContext(path)((_, params) => handler(params))
    promContext("/api/v1/query_range")(
      handlePromQueryRange(spark, _, dbRoot))
    promContext("/api/v1/query")(handlePromInstant(spark, _, dbRoot))
    // dashboards probe buildinfo before their first query; the version
    // names the API LEVEL the bridge speaks (Prometheus-compatible
    // stores answer the same way), application names what it really is
    promContext("/api/v1/status/buildinfo") { _ =>
      """{"status":"success","data":{"version":"2.45.0",""" +
        """"application":"graft-prometheus-bridge"}}"""
    }
    // metadata endpoints (dashboard autocomplete): pure catalog reads
    promContext("/api/v1/labels") { params =>
      val names = promDb(spark, params, dbRoot).labelNames()
      promStrings("__name__" +: names)
    }
    // /api/v1/label/<name>/values — the label name rides in the path
    promRawContext("/api/v1/label/") { (path, params) =>
      val segs = path.split('/').filter(_.nonEmpty)
      // api, v1, label, <name>, values
      require(segs.length == 5 && segs(4) == "values", s"bad path: $path")
      val label = java.net.URLDecoder.decode(segs(3), "UTF-8")
      val db = promDb(spark, params, dbRoot)
      val values =
        if (label == "__name__") db.streams().map(_.name).distinct.sorted
        else db.labelValues(label)
      promStrings(values)
    }
    // /api/v1/series?match[]=<selector> — the catalog streams a
    // selector admits, as Prometheus label-set objects. The full
    // matcher algebra applies (it resolves on the catalog).
    promContext("/api/v1/series") { params =>
      val sels = params.getOrElse("match[]", params.getOrElse("match", Nil))
      if (sels.isEmpty)
        throw new IllegalArgumentException("missing parameter: match[]")
      val db = promDb(spark, params, dbRoot)
      def parseSel(q: String): Expr.Selector = PromParser.parse(q) match {
        case s: Expr.Selector => s
        case other => throw new IllegalArgumentException(
          s"match[] must be a plain selector, got: $other")
      }
      // Prometheus allows a fully nameless `{job="x"}` here (the
      // catalog is the only thing scanned); the query parser requires
      // a name constraint, so inject a match-all __name__. The catch
      // anchors on the NAMELESS error only — a name/__name__ CONFLICT
      // must still reject, not get its literal name silently dropped.
      def parsed(sel: String): Expr.Selector =
        try parseSel(sel)
        catch {
          case e: graft.tsdb.PromParseException
              if e.getMessage.contains("needs a __name__ matcher") =>
            val i = sel.indexOf('{')
            val inner = sel.substring(i + 1).trim
            parseSel(
              if (inner.startsWith("}")) """{__name__=~".*"}"""
              else s"""{__name__=~".*", ${sel.substring(i + 1)}""")
        }
      // multiple match[] selectors UNION, as in Prometheus
      val cat = new graft.tsdb.StreamCatalog(db.streams())
      val hits = sels.flatMap { sel =>
        val p = parsed(sel)
        cat.resolve(p.name, p.matchers)
      }.distinct
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("status", "success")
      val arr = root.putArray("data")
      hits.sortBy(d => (d.name, d.labels.toSeq.sorted.mkString(","))).foreach { d =>
        val o = arr.addObject()
        o.put("__name__", d.name)
        d.labels.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
      }
      mapper.writeValueAsString(root)
    }
    server.setExecutor(null)
    server.start()
    server
  }

  // ---- Prometheus API bridge ----

  /** Query-string / form-body params, MULTI-VALUED (Prometheus sends
    * repeated `match[]` keys; collapsing to last-wins silently drops
    * selectors). Values keep arrival order.
    */
  private def promParseParams(raw: String): Map[String, List[String]] =
    raw.split('&').filter(_.contains("=")).toList
      .map { kv =>
        val i = kv.indexOf('=')
        java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  /** The Prometheus error envelope. */
  private def promErrorBody(e: Exception): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("status", "error")
    root.put("errorType", "bad_data")
    root.put("error", Option(e.getMessage).getOrElse("bad request"))
    m.writeValueAsString(root)
  }

  private def promRespond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** An engine over an empty store — evaluates selector-free scalar
    * expressions with the exact engine semantics and zero file I/O.
    */
  private def storelessEngine(spark: SparkSession): graft.tsdb.TsdbEngine = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("labels", MapType(StringType, StringType)),
      StructField("timestamp", LongType),
      StructField("value", DoubleType)))
    new graft.tsdb.TsdbEngine(spark,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      new graft.tsdb.StreamCatalog(Nil))
  }

  /** A {"status":"success","data":[strings...]} body. */
  private def promStrings(values: Seq[String]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("status", "success")
    val arr = root.putArray("data")
    values.foreach(arr.add)
    mapper.writeValueAsString(root)
  }

  /** Unix seconds (possibly fractional) → epoch ms. */
  private def promSecMs(v: String): Long = math.round(v.toDouble * 1000)

  /** Prometheus step/duration: a float (seconds) or a duration string
    * like "15s" / "1h30m". The float branch is gated on a STRICT
    * numeric pattern, not a parse attempt — Java's Double.parseDouble
    * accepts the 'd'/'f' float-type suffixes, so "1d".toDouble is 1.0
    * and a try/catch dispatch would silently read a one-DAY step as
    * one SECOND. Durations delegate to PromParser.durationMs (the one
    * duration grammar). Zero, negative, and non-finite values reject
    * with Prometheus' own wording.
    */
  private val promFloatRe = "[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r
  private[graft] def promStepMs(v: String): Long = {
    val ms =
      if (promFloatRe.pattern.matcher(v).matches()) math.round(v.toDouble * 1000)
      else PromParser.durationMs(v).getOrElse(
        throw new IllegalArgumentException(s"bad duration: $v"))
    require(ms > 0, s"zero or negative query resolution step: $v")
    ms
  }

  private def promParam(params: Map[String, List[String]], k: String): String =
    params.get(k).flatMap(_.headOption).getOrElse(
      throw new IllegalArgumentException(s"missing parameter: $k"))

  /** Reject `path` unless it resolves under the configured db root —
    * the ONE containment check every endpoint shares (a copy per call
    * site is how a symlink-hardening fix misses one).
    */
  private def checkUnderRoot(path: String, dbRoot: Option[String]): String = {
    dbRoot.foreach { root =>
      val canonical = java.nio.file.Paths.get(root).toAbsolutePath.normalize
      val requested = java.nio.file.Paths.get(path).toAbsolutePath.normalize
      if (!requested.startsWith(canonical))
        throw new IllegalArgumentException(s"path outside db root: $path")
    }
    path
  }

  private def promDb(spark: SparkSession, params: Map[String, List[String]],
      dbRoot: Option[String]): GraftDb = {
    val path = params.get("path").flatMap(_.headOption).orElse(dbRoot)
      .getOrElse(throw new IllegalArgumentException(
        "missing parameter: path (and no db root configured)"))
    new GraftDb(spark, checkUnderRoot(path, dbRoot))
  }

  /** Dispatch a Prometheus-API query over the sliding evaluator.
    * Returns (label column names, rows of (labels..., timestamp,
    * value)). Shape mapping, documented where it deviates:
    *
    *  - `rate(m[5m])` and the other sliding shapes (instant math /
    *    binary composition) evaluate as-is — one unlabeled series.
    *  - `sum by (u) (rate(m[5m]))` → the grouped sliding evaluation:
    *    the inner range fn runs per label group over the group's
    *    POOLED samples (this engine's grouping convention — a group IS
    *    one series), so sum/avg/min/max over that single pooled series
    *    are the identity and all map to the same evaluation. count and
    *    `without` reject loudly.
    *  - a bare selector `m` → last sample per step within a step-sized
    *    lookback (`last_over_time(m[step])` — Prometheus' staleness
    *    lookback, with the window tied to the step instead of 5m).
    *  - `sum by (u) (m)` → the per-step window statistic per group
    *    (sum_over_time/avg/min/max of the group's samples in each
    *    step window).
    */
  private def promEval(db: GraftDb, ast: Expr, startMs: Long,
      endMs: Long, stepMs: Long): (Seq[String], Array[org.apache.spark.sql.Row]) = {
    import graft.tsdb.Expr._
    val e = db.engine()
    def windowed(kind: AggKind): RangeFnKind = kind match {
      case AggSum => FnSumOverTime
      case AggAvg => FnAvgOverTime
      case AggMin => FnMinOverTime
      case AggMax => FnMaxOverTime
      case other => throw new IllegalArgumentException(
        s"unsupported aggregation over the API bridge: $other (sum/avg/" +
          "min/max map to per-step window statistics; others have no " +
          "sliding analogue in the pooled-series model)")
    }
    def grouped(g: Grouping, inner: Expr): (Seq[String], Array[org.apache.spark.sql.Row]) = {
      require(g.by, "the API bridge supports `by` grouping only " +
        "(`without` group columns are canonical strings, not label sets)")
      val df = e.queryRangeBy(inner, g, startMs, endMs, stepMs)
      (g.labels, df.orderBy(
        (g.labels :+ "timestamp").map(org.apache.spark.sql.functions.col): _*)
        .collect())
    }
    def ungrouped(inner: Expr): (Seq[String], Array[org.apache.spark.sql.Row]) = {
      val res = e.queryRange(inner, startMs, endMs, stepMs)
      (Nil, res.output.orderBy("timestamp").collect())
    }
    ast match {
      case Aggregate(kind, rf @ RangeFn(_, _: MatrixSelector, _), Some(g)) =>
        windowed(kind) // validates the kind is bridgeable
        grouped(g, rf)
      case Aggregate(kind, sel: Selector, Some(g)) =>
        grouped(g, RangeFn(windowed(kind), MatrixSelector(sel, stepMs), Nil))
      // the UNGROUPED dashboard staples — `sum(rate(m[5m]))` is the
      // identity over the one pooled series, `sum(m)` the per-step
      // window statistic; both must work, not 400 with an engine error
      case Aggregate(kind, rf @ RangeFn(_, _: MatrixSelector, _), None) =>
        windowed(kind)
        ungrouped(rf)
      case Aggregate(kind, sel: Selector, None) =>
        ungrouped(RangeFn(windowed(kind), MatrixSelector(sel, stepMs), Nil))
      case sel: Selector =>
        ungrouped(RangeFn(FnLastOverTime, MatrixSelector(sel, stepMs), Nil))
      case other =>
        // the sliding evaluator takes the already-parsed AST — parsing
        // once guarantees the dispatched and evaluated trees agree
        ungrouped(other)
    }
  }

  private[tools] def handlePromQueryRange(spark: SparkSession,
      params: Map[String, List[String]], dbRoot: Option[String]): String = {
    val db = promDb(spark, params, dbRoot)
    val startMs = promSecMs(promParam(params, "start"))
    val endMs = promSecMs(promParam(params, "end"))
    val stepMs = promStepMs(promParam(params, "step"))
    require(endMs >= startMs, "end < start")
    val (labels, rows) = promEval(db,
      PromParser.parse(promParam(params, "query")), startMs, endMs, stepMs)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("status", "success")
    val data = root.putObject("data")
    data.put("resultType", "matrix")
    val result = data.putArray("result")
    // rows arrive ordered by (labels..., timestamp): one series object
    // per label tuple, values as [unix_seconds, "value"] pairs
    var curKey: Seq[String] = null
    var curValues: com.fasterxml.jackson.databind.node.ArrayNode = null
    rows.foreach { r =>
      val key = labels.indices.map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString)
      if (curKey == null || key != curKey) {
        curKey = key
        val series = result.addObject()
        val metric = series.putObject("metric")
        labels.zip(key).foreach { case (l, v) => metric.put(l, v) }
        curValues = series.putArray("values")
      }
      val n = labels.size
      if (!r.isNullAt(n + 1)) {
        val pair = curValues.addArray()
        pair.add(r.getLong(n) / 1000.0)
        pair.add(r.getDouble(n + 1).toString)
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Instant query: evaluated at `time` with a single sliding step —
    * resultType "vector", one {metric, value} per series.
    */
  private[tools] def handlePromInstant(spark: SparkSession,
      params: Map[String, List[String]], dbRoot: Option[String]): String = {
    val db = promDb(spark, params, dbRoot)
    val timeMs = promSecMs(promParam(params, "time"))
    // the lookback for bare-selector / grouped-selector shapes
    // (Prometheus' 5m staleness default)
    val lookbackMs = params.get("lookback").flatMap(_.headOption)
      .map(promStepMs).getOrElse(300000L)
    val ast = PromParser.parse(promParam(params, "query"))
    // pure scalar expressions (no selector anywhere: literals, time(),
    // their arithmetic) answer with Prometheus' "scalar" resultType.
    // They evaluate on an engine over an EMPTY store — the exact S2S
    // semantics (incl. the comparison-needs-bool rejection) with no
    // store file listing for a query that touches no data.
    def pureScalar(e: Expr): Boolean = e match {
      case Expr.NumberLit(_) | Expr.TimeFn => true
      case Expr.BinaryOp(_, l, r, None) => pureScalar(l) && pureScalar(r)
      case _ => false
    }
    def scalarBody(v: Double): String = {
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("status", "success")
      val data = root.putObject("data")
      data.put("resultType", "scalar")
      val pair = data.putArray("result")
      pair.add(timeMs / 1000.0)
      pair.add(v.toString)
      mapper.writeValueAsString(root)
    }
    ast match {
      case e if pureScalar(e) =>
        return scalarBody(storelessEngine(spark).query(e, timeMs, timeMs)
          .output.collect().head.getDouble(0))
      case Expr.ScalarFn(_) =>
        // scalar(v) needs the store: the one-element collapse over the
        // staleness lookback, NaN otherwise — already the engine's rule
        val v = db.engine().query(ast, timeMs - lookbackMs, timeMs)
          .output.collect().headOption.map(_.getDouble(0))
          .getOrElse(Double.NaN)
        return scalarBody(v)
      case Expr.VectorFn(child) if pureScalar(child) =>
        // vector(s): one unlabeled sample at the eval time
        val v = storelessEngine(spark).query(ast, timeMs, timeMs)
          .output.collect().head.getDouble(1)
        val mapper = new ObjectMapper()
        val root = mapper.createObjectNode()
        root.put("status", "success")
        val data = root.putObject("data")
        data.put("resultType", "vector")
        val series = data.putArray("result").addObject()
        series.putObject("metric")
        val pair = series.putArray("value")
        pair.add(timeMs / 1000.0)
        pair.add(v.toString)
        return mapper.writeValueAsString(root)
      case _ => ()
    }
    val (labels, rows) = promEval(db, ast, timeMs, timeMs, lookbackMs)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("status", "success")
    val data = root.putObject("data")
    data.put("resultType", "vector")
    val result = data.putArray("result")
    val n = labels.size
    rows.foreach { r =>
      if (!r.isNullAt(n + 1)) {
        val series = result.addObject()
        val metric = series.putObject("metric")
        labels.zipWithIndex.foreach { case (l, i) =>
          metric.put(l, if (r.isNullAt(i)) "" else r.get(i).toString)
        }
        val pair = series.putArray("value")
        pair.add(r.getLong(n) / 1000.0)
        pair.add(r.getDouble(n + 1).toString)
      }
    }
    mapper.writeValueAsString(root)
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

  private[tools] def handleRecord(spark: SparkSession, requestJson: String,
      dbRoot: Option[String]): String = {
    val mapper = new ObjectMapper()
    val req = mapper.readTree(requestJson)
    def field(k: String) = Option(req.get(k)).filterNot(_.isNull)
    def need(k: String) = field(k).getOrElse(
      throw new IllegalArgumentException(s"missing field: $k"))
    val path = allowedPath(req, dbRoot)
    val n = new GraftDb(spark, path).record(
      need("target").asText(), need("query").asText(),
      need("start").asLong(), need("end").asLong(),
      field("step").map(_.asLong()))
    val root = mapper.createObjectNode()
    root.put("recorded", n)
    root.put("target", need("target").asText())
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
    checkUnderRoot(path, dbRoot)
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
