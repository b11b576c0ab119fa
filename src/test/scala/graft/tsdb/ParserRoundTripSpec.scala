package graft.tsdb

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import Expr._

/** Parser ⇄ AST round-trip fuzz: render a random AST to PromQL text,
  * parse it back, and require structural equality. Pure (no Spark).
  * Every binary node renders fully parenthesized, so the property pins
  * tokenizing, clause parsing (grouping in both positions, subquery
  * suffixes, @/offset modifiers, fn arities) — not precedence printing.
  * Precedence itself is pinned by EngineSpec/RangeFnSpec's literal
  * query strings.
  */
class ParserRoundTripSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  // ---- renderer (test-local; the library has no printer) ----

  private def renderSel(s: Selector): String = {
    val m =
      if (s.matchers.isEmpty) ""
      else s.matchers.map(mm => s"""${mm.label}${mm.op.sym}"${mm.value}"""")
        .mkString("{", ", ", "}")
    val at = s.at match {
      case None => ""
      case Some(AtStart) => " @ start()"
      case Some(AtEnd) => " @ end()"
      case Some(AtTime(t)) => s" @ ${t / 1000}" // parser reads unix seconds
    }
    val off =
      if (s.offsetMs == 0) "" // plain offset evaluates too since r11
      else if (s.offsetMs > 0) s" offset ${s.offsetMs}ms"
      else s" offset -${-s.offsetMs}ms"
    s"${s.name}$m$at$off"
  }

  private def binOp(k: BinKind): String = k match {
    case Add => "+"; case Sub => "-"; case Mul => "*"; case Div => "/"
    case Mod => "%"; case Eq => "=="; case Ne => "!="; case Gt => ">"
    case Lt => "<"; case Ge => ">="; case Le => "<="
    case And => "and"; case Or => "or"; case Unless => "unless"
    case Pow => "^"; case Atan2 => "atan2"
    case BoolCmp(c) => binOp(c) + " bool"
  }

  private def aggName(k: AggKind): String = k match {
    case AggSum => "sum"; case AggCount => "count"; case AggAvg => "avg"
    case AggMin => "min"; case AggMax => "max"; case AggStddev => "stddev"
    case AggStdvar => "stdvar"; case AggGroup => "group"
    case _: AggQuantile => "quantile"; case _: AggCountValues => "count_values"
  }

  // quantile/count_values carry a leading literal argument
  private def aggArg(k: AggKind): String = k match {
    case AggQuantile(phi) => s"$phi, "
    case AggCountValues(l) => s""""$l", """
    case _ => ""
  }

  private def rangeFnName(k: RangeFnKind): String = k match {
    case FnRate => "rate"; case FnIncrease => "increase"
    case FnDelta => "delta"; case FnAvgOverTime => "avg_over_time"
    case FnMinOverTime => "min_over_time"; case FnMaxOverTime => "max_over_time"
    case FnSumOverTime => "sum_over_time"; case FnCountOverTime => "count_over_time"
    case FnLastOverTime => "last_over_time"; case FnStddevOverTime => "stddev_over_time"
    case FnStdvarOverTime => "stdvar_over_time"; case FnQuantileOverTime => "quantile_over_time"
    case FnPresentOverTime => "present_over_time"; case FnChanges => "changes"
    case FnResets => "resets"; case FnIdelta => "idelta"; case FnIrate => "irate"
    case FnDeriv => "deriv"; case FnAbsentOverTime => "absent_over_time"
    case FnPredictLinear => "predict_linear"
    case FnMadOverTime => "mad_over_time"
    case FnDoubleExpSmoothing => "double_exponential_smoothing"
  }

  private def renderGrouping(g: Grouping): String =
    s" ${if (g.by) "by" else "without"} (${g.labels.mkString(", ")})"

  private def renderMatch(m: VectorMatch): String = {
    val carry =
      if (m.carry.isEmpty) "" else s"(${m.carry.mkString(", ")})"
    val card = m.card match {
      case OneToOne => ""
      case ManyToOne => s" group_left$carry"
      case OneToMany => s" group_right$carry"
    }
    s" ${if (m.on) "on" else "ignoring"} (${m.labels.mkString(", ")})$card"
  }

  private def render(e: Expr): String = e match {
    case NumberLit(v) =>
      if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
      else v.toString
    case s: Selector => renderSel(s)
    case MatrixSelector(s, r) =>
      // range BEFORE the modifiers, the parser's (and PromQL's) order
      val base = renderSel(s.copy(at = None, offsetMs = 0))
      val mods = renderSel(s).stripPrefix(base)
      s"$base[${r}ms]$mods"
    case BinaryOp(k, l, r, m) =>
      s"(${render(l)} ${binOp(k)}${m.map(renderMatch).getOrElse("")} ${render(r)})"
    case Aggregate(k, c, g) =>
      s"${aggName(k)}(${aggArg(k)}${render(c)})${g.map(renderGrouping).getOrElse("")}"
    case GetK(top, k, c, g) =>
      s"${if (top) "topk" else "bottomk"}(${render(k)}, ${render(c)})" +
        g.map(renderGrouping).getOrElse("")
    case LimitK(k, c) => s"limitk(${render(k)}, ${render(c)})"
    case LimitRatio(r, c) => s"limit_ratio($r, ${render(c)})"
    case RangeFn(k, c, args) =>
      val phi = if (k == FnQuantileOverTime) s"${args.head}, " else ""
      val tail = if (k == FnQuantileOverTime) ""
        else args.map(a => s", $a").mkString
      s"${rangeFnName(k)}($phi${render(c)}$tail)"
    case SubqueryMatrix(c, r, s, off) =>
      val o =
        if (off == 0) ""
        else if (off > 0) s" offset ${off}ms" else s" offset -${-off}ms"
      c match {
        // aggregates and topk take the subquery suffix DIRECTLY
        // (round 13 grammar — `sum(rate(m[5m]))[1h:5m]`): render the
        // paren-free form so the fuzzer exercises the new suffix path,
        // not just the long-standing parenthesized one
        case _: Aggregate | _: GetK =>
          s"${render(c)}[${r}ms:${s}ms]$o"
        case _ => s"(${render(c)})[${r}ms:${s}ms]$o"
      }
    case InstantFn(k, c, args) =>
      s"${k.name}(${render(c)}${args.map(a => s", $a").mkString})"
    case HistogramQuantile(phi, c) =>
      s"histogram_quantile($phi, ${render(c)})"
    case LabelReplace(c, dst, repl, src, re) =>
      s"""label_replace(${render(c)}, "$dst", "$repl", "$src", "$re")"""
    case LabelJoin(c, dst, sep, srcs) =>
      s"""label_join(${render(c)}, "$dst", "$sep", ${
        srcs.map(s0 => s""""$s0"""").mkString(", ")})"""
    case Sort(desc, c) =>
      s"${if (desc) "sort_desc" else "sort"}(${render(c)})"
    case TimestampFn(c) => s"timestamp(${render(c)})"
    case AbsentFn(c) => s"absent(${render(c)})"
  }

  // ---- generators ----

  private val nameGen = Gen.oneOf("metric_a", "up", "http_requests_total", "x1")
  private val labelGen = Gen.oneOf("user", "dc", "service", "l_0")
  private val valueGen = Gen.oneOf("a", "prod", "us_east1", "12")

  private val selGen: Gen[Selector] = for {
    name <- nameGen
    nm <- Gen.choose(0, 2)
    ls <- Gen.listOfN(nm, labelGen).map(_.distinct)
    vs <- Gen.listOfN(ls.size, valueGen)
    ops <- Gen.listOfN(ls.size,
      Gen.oneOf(MatchEq, MatchNe, MatchRe, MatchNre))
    at <- Gen.oneOf(None, Some(AtStart), Some(AtEnd),
      Some(AtTime(1704499200000L)))
    off <- Gen.oneOf(0L, 60000L, -30000L)
  } yield Selector(name,
    ls.zip(vs).zip(ops).map { case ((l, v), o) => Matcher(l, v, o) },
    at, off)

  private val numGen: Gen[NumberLit] =
    Gen.oneOf(Gen.choose(0, 1000).map(n => NumberLit(n.toDouble)),
      Gen.choose(-100, 100).map(n => NumberLit(n / 2.0)))

  private val rangeFnGen: Gen[RangeFn] = for {
    kind <- Gen.oneOf(FnRate, FnIncrease, FnDelta, FnAvgOverTime,
      FnSumOverTime, FnCountOverTime, FnLastOverTime, FnStddevOverTime,
      FnQuantileOverTime, FnPresentOverTime, FnChanges, FnResets,
      FnIdelta, FnIrate, FnDeriv, FnAbsentOverTime,
      FnPredictLinear, FnMadOverTime, FnDoubleExpSmoothing)
    sel <- selGen
    r <- Gen.choose(1L, 86400000L)
    sub <- Gen.oneOf(true, false)
    step <- Gen.choose(1L, 3600000L)
  } yield {
    val args = if (kind == FnQuantileOverTime) List(0.5)
      else if (kind == FnPredictLinear) List(3600.0)
      else if (kind == FnDoubleExpSmoothing) List(0.5, 0.25)
      else Nil
    val inner = RangeFn(kind, MatrixSelector(sel, r), args)
    if (sub && kind != FnAbsentOverTime)
      RangeFn(FnMaxOverTime,
        SubqueryMatrix(inner, r * 2, step, ((r % 3) - 1) * 60000), Nil)
    else inner
  }

  // group_left/right directly before a paren-initial RHS is rejected by
  // the parser (a `(` there reads as a label-carry list), so the
  // generator only attaches many-to-one cards to ident-/number-initial
  // right operands — exactly the strings a user can legally write.
  private def matchingGen(rhs: Expr): Gen[Option[VectorMatch]] = {
    val parenInitial = rhs match {
      case _: BinaryOp | _: SubqueryMatrix => true
      case _ => false
    }
    Gen.option(for {
      on <- Gen.oneOf(true, false)
      n <- Gen.choose(0, 2)
      ls <- Gen.listOfN(n, labelGen).map(_.distinct)
      card <- if (parenInitial) Gen.const(OneToOne: MatchCard)
              else Gen.oneOf[MatchCard](OneToOne, ManyToOne, OneToMany)
      nc <- Gen.choose(0, 2)
      carry <- if (card == OneToOne) Gen.const(Nil: List[String])
               else Gen.listOfN(nc, Gen.oneOf("meta", "node", "tier"))
                 .map(_.distinct)
    } yield VectorMatch(on, ls, card, carry))
  }

  private val groupingGen: Gen[Option[Grouping]] = for {
    g <- Gen.option(for {
      by <- Gen.oneOf(true, false)
      n <- Gen.choose(0, 3)
      ls <- Gen.listOfN(n, labelGen).map(_.distinct)
    } yield Grouping(by, ls))
  } yield g

  private def exprGen(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(numGen, selGen)
    else Gen.frequency(
      2 -> numGen,
      3 -> selGen,
      2 -> rangeFnGen,
      2 -> (for {
        k <- Gen.oneOf[AggKind](AggSum, AggCount, AggAvg, AggMin, AggMax,
          AggStddev, AggStdvar, AggGroup, AggQuantile(0.5),
          AggQuantile(0.99), AggCountValues("bucket"))
        c <- exprGen(depth - 1)
        g <- groupingGen
        // round 13: sometimes hang the subquery suffix straight off
        // the aggregate (`sum(x) by (a)[4s:1s]`) under a range fn —
        // the new grammar path, round-tripped
        sub <- Gen.frequency(3 -> Gen.const(false), 1 -> Gen.const(true))
        step <- Gen.choose(1L, 3600000L)
      } yield {
        val agg = Aggregate(k, c, g)
        if (sub) RangeFn(FnMaxOverTime,
          SubqueryMatrix(agg, step * 4, step, 0), Nil)
        else agg
      }),
      1 -> (for {
        top <- Gen.oneOf(true, false)
        kv <- Gen.choose(0, 20)
        c <- exprGen(depth - 1)
        g <- groupingGen
      } yield GetK(top, NumberLit(kv.toDouble), c, g)),
      1 -> (for {
        ratio <- Gen.oneOf(true, false)
        kv <- Gen.choose(0, 20)
        r <- Gen.oneOf(-1.0, -0.25, 0.5, 1.0)
        c <- exprGen(depth - 1)
      } yield
        if (ratio) LimitRatio(r, c)
        else LimitK(NumberLit(kv.toDouble), c)),
      2 -> (for {
        k <- Gen.oneOf(Add, Sub, Mul, Div, Mod, Eq, Ne, Gt, Lt, Ge, Le,
          And, Or, Unless, Pow, Atan2,
          BoolCmp(Gt), BoolCmp(Eq), BoolCmp(Le))
        l <- exprGen(depth - 1)
        r <- exprGen(depth - 1)
        m <- matchingGen(r)
      } yield BinaryOp(k, l, r, m)),
      1 -> (for {
        k <- Gen.oneOf(FnAbs, FnCeil, FnFloor, FnSqrt, FnExp, FnLn,
          FnLog2, FnLog10, FnSgn)
        c <- exprGen(depth - 1)
      } yield InstantFn(k, c, Nil)),
      1 -> (for {
        c <- exprGen(depth - 1)
        args <- Gen.oneOf(List(0.5), List(10.0))
      } yield InstantFn(FnClampMin, c, args)),
      1 -> (for {
        phi <- Gen.oneOf(0.5, 0.9, 0.99)
        c <- exprGen(depth - 1)
      } yield HistogramQuantile(phi, c)),
      1 -> (for {
        c <- exprGen(depth - 1)
        dst <- labelGen; src <- labelGen
      } yield LabelReplace(c, dst, "$1", src, "(.*)")),
      1 -> (for {
        c <- exprGen(depth - 1)
        dst <- labelGen
        n <- Gen.choose(1, 3)
        srcs <- Gen.listOfN(n, labelGen).map(_.distinct)
      } yield LabelJoin(c, dst, "-", srcs)),
      1 -> (for {
        d <- Gen.oneOf(true, false)
        c <- exprGen(depth - 1)
      } yield Sort(d, c)),
      1 -> exprGen(depth - 1).map(TimestampFn(_)),
      1 -> exprGen(depth - 1).map(AbsentFn(_)))

  test("render → parse round-trips 400 random ASTs structurally") {
    val cases = samples(exprGen(3), 400)
    assert(cases.size >= 350, s"generator discarded too much: ${cases.size}")
    cases.foreach { e =>
      val text = render(e)
      val back =
        try PromParser.parse(text)
        catch { case ex: Exception =>
          fail(s"parse failed on '$text' (from $e): ${ex.getMessage}")
        }
      assert(back == e, s"round-trip mismatch on '$text'")
    }
  }

  test("negative literals and unary minus round-trip") {
    assert(PromParser.parse("-3.5") == NumberLit(-3.5))
    assert(PromParser.parse("(-3.5 + up)") ==
      BinaryOp(Add, NumberLit(-3.5), Selector("up", Nil, None, 0)))
    // -vec desugars to 0 - vec
    assert(PromParser.parse("-up") ==
      BinaryOp(Sub, NumberLit(0), Selector("up", Nil, None, 0)))
  }

  test("durationMs requires strictly descending, non-repeating units (Prometheus' rule)") {
    assert(PromParser.durationMs("1h30m") == Some(5400000L))
    assert(PromParser.durationMs("1y2w3d4h5m6s7ms") ==
      Some(31536000000L + 2 * 604800000L + 3 * 86400000L +
        4 * 3600000L + 5 * 60000L + 6000L + 7L))
    // out-of-order and repeated units reject, as Prometheus does
    assert(PromParser.durationMs("30m1h").isEmpty)
    assert(PromParser.durationMs("5m5m").isEmpty)
    assert(PromParser.durationMs("1s500ms").isDefined)
    assert(PromParser.durationMs("500ms1s").isEmpty)
    // the QUERY surface shares the law (the tokenizer delegates):
    // a step param and a range literal must agree on what parses
    assert(PromParser.parse("rate(m[1h30m])") ==
      RangeFn(FnRate, MatrixSelector(Selector("m", Nil, None, 0), 5400000L)))
    intercept[PromParseException](PromParser.parse("rate(m[5m5m])"))
    intercept[PromParseException](PromParser.parse("rate(m[30m1h])"))
  }

  test("parseSeriesSelector permits namelessness, still rejects conflicts and non-selectors") {
    // nameless → match-all __name__ injected (catalog-only resolution)
    assert(PromParser.parseSeriesSelector("""{job="x"}""") ==
      Selector("", List(Matcher("__name__", ".*", MatchRe),
        Matcher("job", "x")), None, 0))
    // a literal name parses as usual
    assert(PromParser.parseSeriesSelector("""up{job="x"}""") ==
      Selector("up", List(Matcher("job", "x")), None, 0))
    // name/__name__ conflict must NOT be recovered into namelessness
    intercept[PromParseException](
      PromParser.parseSeriesSelector("""up{__name__="other"}"""))
    // the query surface keeps requiring a name constraint
    intercept[PromParseException](PromParser.parse("""{job="x"}"""))
    // non-selector expressions reject loudly
    intercept[PromParseException](PromParser.parseSeriesSelector("sum(up)"))
  }
}
