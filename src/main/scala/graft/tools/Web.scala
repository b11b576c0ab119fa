package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.tsdb.{Expr, GraftDb, LabelCodec, PromParser, VType}

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
      // Prometheus allows a fully nameless `{job="x"}` here (the
      // catalog is the only thing scanned): parseSeriesSelector is the
      // parser's OWN nameless-permitting entry point — it injects the
      // match-all __name__ itself and still rejects a name/__name__
      // CONFLICT, so no error-message sniffing or query re-splicing
      // (which a reworded parser error would silently break).
      // Multiple match[] selectors UNION, as in Prometheus.
      val cat = new graft.tsdb.StreamCatalog(db.streams())
      val hits = sels.flatMap { sel =>
        val p = PromParser.parseSeriesSelector(sel)
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

  /** A Prometheus time parameter → epoch ms: unix seconds (possibly
    * fractional; the STRICT float pattern — see [[promStepMs]] for why
    * a parse-attempt dispatch silently misreads duration-suffixed
    * strings) or an RFC3339 timestamp (`2026-08-16T00:00:00Z`,
    * fractional seconds and numeric offsets included — promtool and
    * Grafana both send this form). Garbage gets Prometheus' own
    * error wording, not a raw NumberFormatException.
    */
  private[graft] def promTimeMs(params: Map[String, List[String]],
      k: String): Long = {
    val v = promParam(params, k)
    if (promFloatRe.pattern.matcher(v).matches()) math.round(v.toDouble * 1000)
    else
      try java.time.OffsetDateTime.parse(v).toInstant.toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"""invalid parameter "$k": cannot parse "$v" to a valid timestamp""")
      }
  }

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
    * site is how a symlink-hardening fix misses one). Resolution is
    * REAL (symlinks followed on the deepest existing prefix, the
    * not-yet-created remainder appended lexically), so a link planted
    * inside the root pointing outside it cannot pass the containment
    * test a purely lexical normalize would grant.
    */
  private def checkUnderRoot(path: String, dbRoot: Option[String]): String = {
    dbRoot.foreach { root =>
      import java.nio.file.{Files, LinkOption, Path}
      // Existence probes NOFOLLOW: a DANGLING symlink must count as the
      // deepest existing component and get its target resolved by hand
      // — Files.exists() follows links, so a dangling one would read as
      // "not there yet", be re-appended lexically onto the real root,
      // and pass containment while the filesystem later CREATES the
      // store through the link, outside the root.
      def real(p0: Path, depth: Int = 0): Path = {
        require(depth < 40, s"symlink chain too deep resolving: $p0")
        var existing = p0
        var rest = List.empty[String]
        while (existing != null &&
            !Files.exists(existing, LinkOption.NOFOLLOW_LINKS)) {
          rest = existing.getFileName.toString :: rest
          existing = existing.getParent
        }
        if (existing == null)
          rest.foldLeft(p0.getRoot)(_.resolve(_)).normalize
        else if (Files.isSymbolicLink(existing)) {
          val target = Files.readSymbolicLink(existing)
          val resolved =
            if (target.isAbsolute) target
            else existing.getParent.resolve(target)
          real(rest.foldLeft(resolved)(_.resolve(_)).normalize, depth + 1)
        } else rest.foldLeft(existing.toRealPath())(_.resolve(_)).normalize
      }
      val canonical = real(java.nio.file.Paths.get(root).toAbsolutePath)
      val requested = real(java.nio.file.Paths.get(path).toAbsolutePath)
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

  /** One evaluated API-bridge query: the series-key column names, a
    * flag marking the one-column canonical `without` encoding (the
    * serializer re-opens it into per-label metric fields), and the
    * collected (labels..., timestamp, value) rows.
    */
  private final case class PromMatrix(labels: Seq[String],
      canonical: Boolean, rows: Array[Row])

  /** The ONE definition of "an already-windowed inner the sliding
    * evaluators accept": a range function over a matrix selector or a
    * subquery. Every promEval dispatch arm matches through this — a
    * new admitted child shape lands here once, not at five sites.
    */
  private object SlidingShape {
    def unapply(e: Expr): Option[Expr.RangeFn] = e match {
      case rf @ Expr.RangeFn(_,
          _: Expr.MatrixSelector | _: Expr.SubqueryMatrix, _) => Some(rf)
      case _ => None
    }
  }

  /** Dispatch a Prometheus-API query over the sliding evaluator.
    * Shape mapping, documented where it deviates:
    *
    *  - `rate(m[5m])` and the other sliding shapes (instant math /
    *    binary and set composition) evaluate as-is — one unlabeled
    *    series.
    *  - `sum by (u) (rate(m[5m]))` → the grouped sliding evaluation:
    *    the inner range fn runs per label group over the group's
    *    POOLED samples (this engine's grouping convention — a group IS
    *    one series). Over that single-series group the aggregation
    *    family answers exactly as Prometheus does for a one-series
    *    group: sum/avg/min/max/quantile are the identity, count is 1,
    *    stddev/stdvar are 0.
    *  - a bare selector `m` → last sample per step within a step-sized
    *    lookback (`last_over_time(m[step])` — Prometheus' staleness
    *    lookback, with the window tied to the step instead of 5m).
    *  - `sum by (u) (m)` → the per-step window statistic per group
    *    (sum/avg/min/max/count/stddev/stdvar/quantile _over_time of
    *    the group's samples in each step window).
    *  - `without` grouping emits the engine's canonical label-set
    *    column; the serializer decodes it back to metric fields.
    *  - `topk(k, <grouped aggregate>)` / bottomk → the k best groups
    *    AT EACH STEP by value (a step-partitioned rank over the
    *    step-count × group-count frame — bounded, never a global
    *    sort). k must be a literal.
    */
  private def promEval(db: GraftDb, ast: Expr, startMs: Long,
      endMs: Long, stepMs: Long): PromMatrix = {
    import graft.tsdb.Expr._
    val e = db.engine()
    // both mappings live on the ENGINE now (TsdbEngine.windowedAgg /
    // pooledAggPost — round 13 lifted them from here so the engine's
    // sliding Aggregate arms and this bridge agree by construction);
    // these are thin aliases keeping the dispatch below readable
    def windowed(kind: AggKind): (RangeFnKind, List[Double]) =
      graft.tsdb.TsdbEngine.windowedAgg(kind)
    def pooledIdentity(kind: AggKind)(df: DataFrame): DataFrame =
      graft.tsdb.TsdbEngine.pooledAggPost(kind)(df)
    def groupCols(g: Grouping): Seq[String] =
      if (g.by) g.labels else Seq("labels")
    def grouped(g: Grouping, inner: Expr,
        post: DataFrame => DataFrame = identity): PromMatrix = {
      val cols = groupCols(g)
      val df = post(e.queryRangeBy(inner, g, startMs, endMs, stepMs))
      PromMatrix(cols, canonical = !g.by, df.orderBy(
        (cols :+ "timestamp").map(col): _*).collect())
    }
    def ungrouped(inner: Expr,
        post: DataFrame => DataFrame = identity): PromMatrix =
      PromMatrix(Nil, canonical = false,
        post(e.queryRange(inner, startMs, endMs, stepMs).output)
          .orderBy("timestamp").collect())
    // the grouped/ungrouped evaluation of one Aggregate node
    def aggregate(kind: AggKind, child: Expr, g: Option[Grouping],
        post: DataFrame => DataFrame = identity): PromMatrix =
      (child, g) match {
        case (SlidingShape(rf), Some(gr)) =>
          grouped(gr, rf, df => post(pooledIdentity(kind)(df)))
        case (sel: Selector, Some(gr)) =>
          val (k, args) = windowed(kind)
          grouped(gr, RangeFn(k, MatrixSelector(sel, stepMs), args), post)
        // the UNGROUPED dashboard staples — `sum(rate(m[5m]))` over
        // the one pooled series, `sum(m)` the per-step window
        // statistic; both must work, not 400 with an engine error
        case (SlidingShape(rf), None) =>
          ungrouped(rf, df => post(pooledIdentity(kind)(df)))
        case (sel: Selector, None) =>
          val (k, args) = windowed(kind)
          ungrouped(RangeFn(k, MatrixSelector(sel, stepMs), args), post)
        case (other, _) => throw new IllegalArgumentException(
          s"the API bridge aggregates a selector or a range function " +
            s"over a matrix selector, got: $other")
      }
    // one grouped aggregate's INNER as an expression the grouped
    // sliding evaluator can compose: selectors get their _over_time
    // mapping; already-windowed inners are the pooled-series identity
    // for sum/avg/min/max/quantile — kinds whose one-series answer is
    // a TRANSFORM (count→1, stddev→0) cannot ride inside a composed
    // tree and reject with guidance
    def bridgeInner(kind: AggKind, child: Expr): Expr = child match {
      case SlidingShape(rf) => kind match {
        case AggSum | AggAvg | AggMin | AggMax => rf
        case AggQuantile(phi) =>
          require(phi >= 0 && phi <= 1, s"quantile φ out of [0, 1]: $phi")
          rf
        case other => throw new IllegalArgumentException(
          s"$other over an already-windowed inner cannot compose " +
            "inside binary/set expressions over the API bridge (its " +
            "one-pooled-series answer is a constant — query it " +
            "standalone)")
      }
      case sel: Selector =>
        val (k, args) = windowed(kind)
        RangeFn(k, MatrixSelector(sel, stepMs), args)
      case other => throw new IllegalArgumentException(
        s"the API bridge aggregates a selector or a range function " +
          s"over a matrix selector, got: $other")
    }
    // map a COMPOSED aggregate tree — binary/set/instant math over
    // aggregates, grouped OR ungrouped, literals welcome — into
    // (grouping, inner expr) for ONE sliding evaluation: the ratio
    // panels `sum by (s) (err) / sum by (s) (req)` AND the ungrouped
    // staple `sum(rate(err[5m])) / sum(rate(req[5m]))`, the masking
    // idiom `sum by (s) (m) unless (count by (s) (m) > 1)`. None = no
    // aggregate anywhere in the tree (the plain sliding paths own it).
    // An aggregate-free side (literals always; any sliding shape when
    // the evaluation is UNGROUPED) rides along raw; grouped × raw
    // rejects — no shared key in the pooled-series model.
    def composedTree(e: Expr): Option[(Option[Grouping], Expr)] = e match {
      case Aggregate(k, c, g) => Some((g, bridgeInner(k, c)))
      case BinaryOp(kind, l, r, None) =>
        def mixed(other: Expr): Nothing = throw new IllegalArgumentException(
          s"grouped and ungrouped operands cannot compose over the " +
            s"API bridge (no shared key in the pooled-series model): " +
            s"$other")
        // grouping equality is order-INsensitive: `sum by (a,b) (x) /
        // sum by (b,a) (y)` is one grouping — the engine joins group
        // columns by NAME, so label order never matters (ADVICE r12)
        def same(a: Option[Grouping], b: Option[Grouping]): Boolean =
          (a, b) match {
            case (Some(x), Some(y)) =>
              x.by == y.by && x.labels.toSet == y.labels.toSet
            case (x, y) => x == y
          }
        (composedTree(l), composedTree(r)) match {
          case (Some((gl, le)), Some((gr, re))) =>
            require(same(gl, gr), "grouped operands must share the same " +
              s"grouping over the API bridge: $gl vs $gr")
            Some((gl, BinaryOp(kind, le, re)))
          case (Some((g, le)), None) =>
            if (g.isEmpty || r.isInstanceOf[NumberLit])
              Some((g, BinaryOp(kind, le, r)))
            else mixed(r)
          case (None, Some((g, re))) =>
            if (g.isEmpty || l.isInstanceOf[NumberLit])
              Some((g, BinaryOp(kind, l, re)))
            else mixed(l)
          case (None, None) => None
        }
      case InstantFn(k, c, args) =>
        composedTree(c).map { case (g, ce) => (g, InstantFn(k, ce, args)) }
      case _ => None
    }
    // topk/bottomk k over the bridge: ALWAYS the engine's k-subplan
    // path (scalarK — literals take its no-Spark-job fast arm), so
    // every topk surface interprets the same k text identically
    // (round-and-clamp; a local v.toInt here would truncate 2.9 → 2
    // while the engine rounds → 3, review r13)
    def kOf(kExpr: Expr): Int = e.scalarK(kExpr, startMs, endMs)
    // the grouping a subquery inner's aggregate tree carries, if any —
    // walked (first hit wins) so the bridge can route grouped sliding
    // subqueries through queryRangeBy; the engine re-validates that
    // every aggregate in the tree agrees with the evaluation grouping.
    // DELIBERATE asymmetry with composedTree's top-level mixed()
    // rejection: inside a subquery the ENGINE's grouped evaluator owns
    // the semantics, where grouping DISTRIBUTES over the whole inner —
    // an aggregate-free operand beside a grouped aggregate evaluates
    // per group (the ts101 convention: `sum_over_time(a[1d]) /
    // sum_over_time(b[1d])` by user groups BOTH sides); at top level
    // the ungrouped side would evaluate POOLED (slidingEval), and
    // pooled × grouped genuinely has no shared key
    def subqueryGrouping(e: Expr): Option[Grouping] = e match {
      case Aggregate(_, c, g) => g.orElse(subqueryGrouping(c))
      case BinaryOp(_, l, r, _) =>
        subqueryGrouping(l).orElse(subqueryGrouping(r))
      case InstantFn(_, c, _) => subqueryGrouping(c)
      case RangeFn(_, c, _) => subqueryGrouping(c)
      case SubqueryMatrix(c, _, _, _) => subqueryGrouping(c)
      case _ => None
    }
    // count_values anywhere in a sampler child: the sampler picks
    // SERIES and count_values keys its output series by VALUE text, so
    // routing it to the grouped evaluator would fail deep with a
    // generic sliding-grouping error (advice r14) — reject up front
    // with guidance instead
    def containsCountValues(e0: Expr): Boolean = e0 match {
      case Aggregate(AggCountValues(_), _, _) => true
      case Aggregate(_, c, _) => containsCountValues(c)
      case BinaryOp(_, l, r, _) =>
        containsCountValues(l) || containsCountValues(r)
      case InstantFn(_, c, _) => containsCountValues(c)
      case RangeFn(_, c, _) => containsCountValues(c)
      case SubqueryMatrix(c, _, _, _) => containsCountValues(c)
      case _ => false
    }
    // per-step sampling dispatch shared by ranged limitk/limit_ratio
    // (round 15): matched grouped binaries route through the engine's
    // matched twins (series key = many-side groups + carried labels);
    // any other child whose grouping resolves samples its grouped
    // matrix through the queryRangeBy scope — grouped aggregates,
    // grouped binaries and set-ops, exactly the inners the engine
    // surface already takes
    def rangedSample(child: Expr, op: String, hint: String)(
        groupedInner: Grouping => DataFrame,
        matchedInner: (Expr, Grouping, Expr, Grouping, BinKind,
          VectorMatch) => DataFrame): PromMatrix =
      child match {
        case BinaryOp(kind, Aggregate(lk, lc, Some(gl)),
            Aggregate(rk, rc, Some(gr)), Some(vm)) =>
          val cols = e.matchedSeriesCols(gl, gr, vm)
          val manyBy = (if (vm.card == OneToMany) gr else gl).by
          val df = matchedInner(
            bridgeInner(lk, lc), gl, bridgeInner(rk, rc), gr, kind, vm)
          PromMatrix(cols, canonical = !manyBy, df.orderBy(
            (cols :+ "timestamp").map(col): _*).collect())
        case _ =>
          require(!containsCountValues(child),
            s"ranged $op samples SERIES — count_values keys series by " +
              s"VALUE text; aggregate into label groups instead: $hint")
          subqueryGrouping(child) match {
            case Some(g) =>
              val cols = groupCols(g)
              val df = groupedInner(g)
              PromMatrix(cols, canonical = !g.by, df.orderBy(
                (cols :+ "timestamp").map(col): _*).collect())
            case None => throw new IllegalArgumentException(
              s"ranged $op samples SERIES — aggregate into groups " +
                s"first: $hint; got child: $child")
          }
      }
    // composition roots dispatch ONCE (walking twice would re-run
    // composedTree's validation); single Aggregate roots stay on the
    // more capable aggregate() arm (its pooledIdentity covers the
    // count→1/stddev→0 transforms bridgeInner can't express)
    val composed = ast match {
      case e @ (_: BinaryOp | _: InstantFn) => composedTree(e)
      case _ => None
    }
    composed match {
      case Some((Some(g), inner)) => return grouped(g, inner)
      case Some((None, inner)) => return ungrouped(inner)
      case None => ()
    }
    ast match {
      // MATCHED grouped composition — the share-of-parent panel:
      // `sum by (a,b) (x) / on (a) group_left sum by (a) (y)` at every
      // step. Each side maps through bridgeInner with its own grouping
      // and the engine joins per (match key, step); the series labels
      // are the MANY side's groups plus any carried labels
      case BinaryOp(kind, Aggregate(lk, lc, Some(gl)),
          Aggregate(rk, rc, Some(gr)), Some(vm)) =>
        // `without` sides ride the canonical labels column (round 13 —
        // the engine re-opens the match-key values); the serializer
        // decodes the canonical group identity back into metric fields
        val manyG = if (vm.card == OneToMany) gr else gl
        require(manyG.by || vm.carry.isEmpty,
          "label-carry onto a without-grouped many side is not " +
            "supported over the API bridge — the carried column has " +
            "no metric field inside the canonical identity; re-group " +
            "the many side with `by`")
        val df = e.queryRangeByMatched(
          bridgeInner(lk, lc), gl, bridgeInner(rk, rc), gr,
          kind, vm, startMs, endMs, stepMs)
        val cols =
          (if (manyG.by) manyG.labels else Seq("labels")) ++ vm.carry
        PromMatrix(cols, canonical = !manyG.by, df.orderBy(
          (cols :+ "timestamp").map(col): _*).collect())
      case Aggregate(AggCountValues(label), inner, None) =>
        // count_values over the bridge (round 13; general inners round
        // 14): value-bucketed per-step counts — a bare selector counts
        // raw samples in their unique step windows; any sliding-
        // evaluable inner (rate, instant math, grouped aggregates)
        // counts the derived series per step. One scan either way,
        // series keyed by the VALUE label
        val df = e.countValuesRange(label, inner, startMs, endMs, stepMs)
        PromMatrix(Seq(label), canonical = false, df.orderBy(
          col(label), col("timestamp")).collect())
      case Aggregate(kind, child, g) =>
        aggregate(kind, child, g)
      case GetK(top, kExpr, agg @ Aggregate(_, _, Some(gr)), None) =>
        // topk(k, sum by (u) (...)): the k best groups at each step —
        // the engine's per-step rank (queryRangeGetK, round 13; its
        // ge() Aggregate arm does the windowed/pooled translation this
        // arm used to duplicate); k literal or scalar expression
        val cols = groupCols(gr)
        val df = e.queryRangeGetK(top, kExpr, agg, gr,
          startMs, endMs, stepMs)
        PromMatrix(cols, canonical = !gr.by, df.orderBy(
          (cols :+ "timestamp").map(col): _*).collect())
      case GetK(_, kExpr, child, Some(g)) =>
        // `topk by (s) (k, m)` — WITHIN-group top-k: each group is ONE
        // pooled series, so k ≥ 1 is the identity (exactly Prometheus'
        // one-series-group answer) and k = 0 empties; contrast with
        // `topk(k, sum by (s) (m))`, the ACROSS-groups ranking above
        val k = kOf(kExpr)
        val inner = child match {
          case SlidingShape(rf) => rf
          case sel: Selector =>
            RangeFn(FnLastOverTime, MatrixSelector(sel, stepMs), Nil)
          case other => throw new IllegalArgumentException(
            s"the API bridge ranks a selector or a range function over " +
              s"a matrix selector, got: $other")
        }
        grouped(g, inner, df => if (k <= 0) df.limit(0) else df)
      case LimitK(kExpr, inner) =>
        // limitk(k, <grouped matrix>) at every step — the engine's
        // per-step md5-order sampling (round 14; general inners +
        // matched composition round 15): same matrix shape as ranged
        // topk, the sampling order instead of the value one. Any child
        // whose grouping resolves routes (grouped aggregates, grouped
        // binaries/set-ops — the queryRangeBy scope); matched grouped
        // binaries ride the matched twin
        rangedSample(inner, "limitk", "limitk(3, sum by (s) (m))")(
          g => e.queryRangeLimitK(kExpr, inner, g, startMs, endMs, stepMs),
          (l, gl, r, gr, kind, vm) => e.queryRangeLimitKMatched(
            kExpr, l, gl, r, gr, kind, vm, startMs, endMs, stepMs))
      case LimitRatio(ratio, inner) =>
        rangedSample(inner, "limit_ratio",
          "limit_ratio(0.5, sum by (s) (m))")(
          g => e.queryRangeLimitRatio(ratio, inner, g, startMs, endMs,
            stepMs),
          (l, gl, r, gr, kind, vm) => e.queryRangeLimitRatioMatched(
            ratio, l, gl, r, gr, kind, vm, startMs, endMs, stepMs))
      case sel: Selector =>
        ungrouped(RangeFn(FnLastOverTime, MatrixSelector(sel, stepMs), Nil))
      case rf @ RangeFn(_, SubqueryMatrix(inner, _, _, _), _) =>
        // sliding subquery — routes GROUPED when the inner tree holds
        // a by/without aggregate (`quantile_over_time(0.9, sum by (s)
        // (rate(m[5m]))[1h:5m])`): the group columns become the series
        // labels and the engine's grouped Aggregate arm evaluates;
        // groupless inners ride the plain ungrouped path below
        subqueryGrouping(inner) match {
          case Some(g) =>
            val cols = groupCols(g)
            val df = e.queryRangeBy(rf, g, startMs, endMs, stepMs)
            PromMatrix(cols, canonical = !g.by, df.orderBy(
              (cols :+ "timestamp").map(col): _*).collect())
          case None => ungrouped(rf)
        }
      case other =>
        // the sliding evaluator takes the already-parsed AST — parsing
        // once guarantees the dispatched and evaluated trees agree
        ungrouped(other)
    }
  }

  /** Write one series' metric object: plain `by` labels map 1:1; the
    * `without` canonical column (k=v,k=v, LabelCodec-escaped) re-opens
    * into per-label fields — "" is the empty label set.
    */
  private def putMetric(metric: ObjectNode, labels: Seq[String],
      canonical: Boolean, key: Seq[String]): Unit =
    if (canonical)
      LabelCodec.decodeLabels(key.headOption.getOrElse(""),
          s"without group '${key.headOption.getOrElse("")}'")
        .toSeq.sortBy(_._1).foreach { case (k, v) => metric.put(k, v) }
    else labels.zip(key).foreach { case (l, v) => metric.put(l, v) }

  private[tools] def handlePromQueryRange(spark: SparkSession,
      params: Map[String, List[String]], dbRoot: Option[String]): String = {
    val db = promDb(spark, params, dbRoot)
    val startMs = promTimeMs(params, "start")
    val endMs = promTimeMs(params, "end")
    val stepMs = promStepMs(promParam(params, "step"))
    require(endMs >= startMs, "end < start")
    val m = promEval(db,
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
    m.rows.foreach { r =>
      val key = m.labels.indices.map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString)
      if (curKey == null || key != curKey) {
        curKey = key
        val series = result.addObject()
        putMetric(series.putObject("metric"), m.labels, m.canonical, key)
        curValues = series.putArray("values")
      }
      val n = m.labels.size
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
    val timeMs = promTimeMs(params, "time")
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
      case Expr.ScalarFn(child) =>
        // scalar(v) needs the store: the one-element collapse, NaN
        // otherwise. A BARE-SELECTOR child first maps to its latest
        // sample within the staleness lookback — the same
        // last_over_time mapping the bare-selector vector arm uses —
        // because the engine's whole-range evaluation would otherwise
        // hand the collapse EVERY lookback sample (any normally-scraped
        // series has >1) and answer NaN where Prometheus returns the
        // single series' latest value. Start is lookback-exclusive /
        // end-inclusive ((t-5m, t], one window) like Prometheus'.
        val (expr, startAt) = child match {
          case sel: Expr.Selector => (Expr.ScalarFn(Expr.RangeFn(
            Expr.FnLastOverTime, Expr.MatrixSelector(sel, lookbackMs), Nil)),
            timeMs - lookbackMs + 1)
          case _ => (ast, timeMs - lookbackMs)
        }
        val v = db.engine().query(expr, startAt, timeMs)
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
    val m = promEval(db, ast, timeMs, timeMs, lookbackMs)
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("status", "success")
    val data = root.putObject("data")
    data.put("resultType", "vector")
    val result = data.putArray("result")
    val n = m.labels.size
    m.rows.foreach { r =>
      if (!r.isNullAt(n + 1)) {
        val series = result.addObject()
        val key = m.labels.indices.map(i =>
          if (r.isNullAt(i)) "" else r.get(i).toString)
        putMetric(series.putObject("metric"), m.labels, m.canonical, key)
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
    // optional "by" (array or comma-separated string, the /query
    // convention) selects the GROUPED rule — one derived stream per
    // group under `target`, labels preserved; it requires "step"
    // (grouped rules record the per-step series)
    val by: List[String] = field("by") match {
      case None => Nil
      case Some(n) if n.isArray =>
        val it = n.elements(); val b = List.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      case Some(n) =>
        n.asText().split(',').map(_.trim).filter(_.nonEmpty).toList
    }
    val db = new GraftDb(spark, path)
    val n =
      if (by.isEmpty)
        db.record(need("target").asText(), need("query").asText(),
          need("start").asLong(), need("end").asLong(),
          field("step").map(_.asLong()))
      else db.recordGrouped(need("target").asText(), need("query").asText(),
        graft.tsdb.Expr.Grouping(by = true, by),
        need("start").asLong(), need("end").asLong(),
        field("step").map(_.asLong()).getOrElse(
          throw new IllegalArgumentException(
            "\"by\" requires \"step\" (grouped rules record the " +
              "per-step series)")))
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
