package graft.tsdb

import scala.util.matching.Regex

import Expr._

/** Hand-written recursive-descent parser for the PromQL subset the
  * reference engine accepts (see Ast.scala), plus this engine's range
  * function extension (`rate(m[5m])` and friends — the reference rejects
  * all Call exprs). Built from the public PromQL grammar
  * (prometheus.io/docs/prometheus/latest/querying/basics); no
  * third-party parser.
  *
  * Precedence (low→high): comparison < +,- < *,/,% < unary- < atom.
  */
final class PromParseException(msg: String) extends IllegalArgumentException(msg)

object PromParser {

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TDur(ms: Long) extends Tok
  private final case class TOp(s: String) extends Tok
  private case object TEof extends Tok

  private val durRe: Regex = raw"(\d+)(ms|s|m|h|d|w|y)".r
  private val numRe: Regex = raw"(\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)".r
  private val identRe: Regex = raw"[a-zA-Z_:][a-zA-Z0-9_:]*".r

  /** A standalone PromQL duration string ("15s", "1h30m") → ms. The
    * ONE duration grammar — surfaces (the HTTP bridge's step/lookback
    * params) must not hand-roll a second copy that can drift. Units
    * must appear in strictly DESCENDING order, each at most once —
    * Prometheus rejects "30m1h" and "5m5m", so accepting them here
    * would let the bridge admit step params a real Prometheus 400s.
    */
  def durationMs(v: String): Option[Long] = {
    var rest = v
    var ms = 0L
    var any = false
    var ok = true
    var lastRank = -1 // unit ranks ascend y→ms; repeats/reorders reject
    while (ok && rest.nonEmpty) durRe.findPrefixMatchOf(rest) match {
      case Some(d) =>
        val rank = unitRank(d.group(2))
        if (rank <= lastRank) ok = false
        else {
          lastRank = rank
          ms += d.group(1).toLong * unitMs(d.group(2))
          rest = rest.substring(d.end)
          any = true
        }
      case None => ok = false
    }
    if (ok && any) Some(ms) else None
  }

  private def unitMs(u: String): Long = u match {
    case "ms" => 1L
    case "s" => 1000L
    case "m" => 60000L
    case "h" => 3600000L
    case "d" => 86400000L
    case "w" => 604800000L
    case "y" => 31536000000L
  }

  /** Descending-order rank for [[durationMs]]'s unit ordering check. */
  private def unitRank(u: String): Int = u match {
    case "y" => 0
    case "w" => 1
    case "d" => 2
    case "h" => 3
    case "m" => 4
    case "s" => 5
    case "ms" => 6
  }

  private def tokenize(q: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q.charAt(i) != quote) {
          if (q.charAt(i) == '\\' && i + 1 < n) { sb.append(q.charAt(i + 1)); i += 2 }
          else { sb.append(q.charAt(i)); i += 1 }
        }
        if (i >= n) throw new PromParseException(s"unterminated string in: $q")
        i += 1
        toks += TStr(sb.toString)
      } else if (c.isDigit || (c == '.' && i + 1 < n && q.charAt(i + 1).isDigit)) {
        // duration (5m, 1h30m…) or plain number
        durRe.findPrefixMatchOf(q.substring(i)) match {
          case Some(m) if !numRe.findPrefixMatchOf(q.substring(i)).exists(_.end > m.end) =>
            // consume a chain of duration parts (1h30m), delegating
            // the value to durationMs — THE one duration grammar, so
            // the query surface rejects "5m5m"/"30m1h" exactly like
            // the HTTP step params do (Prometheus' unit-order rule)
            var rest = q.substring(i)
            var consumed = 0
            var continue = true
            while (continue) durRe.findPrefixMatchOf(rest) match {
              case Some(d) =>
                consumed += d.end; rest = rest.substring(d.end)
              case None => continue = false
            }
            val text = q.substring(i, i + consumed)
            val ms = durationMs(text).getOrElse(throw new PromParseException(
              s"bad duration '$text' (units must descend, each at most " +
                s"once) in: $q"))
            i += consumed
            toks += TDur(ms)
          case _ =>
            val m = numRe.findPrefixMatchOf(q.substring(i)).getOrElse(
              throw new PromParseException(s"bad number at '$q'.substring($i)"))
            toks += TNum(m.group(1).toDouble)
            i += m.end
        }
      } else identRe.findPrefixMatchOf(q.substring(i)) match {
        case Some(m) =>
          toks += TIdent(m.matched)
          i += m.end
        case None =>
          val two = if (i + 1 < n) q.substring(i, i + 2) else ""
          if (Set("==", "!=", ">=", "<=", "=~", "!~").contains(two)) {
            toks += TOp(two); i += 2
          } else if ("+-*/%^(){}[],=@<>".indexOf(c) >= 0) {
            toks += TOp(c.toString); i += 1
          } else throw new PromParseException(s"unexpected character '$c' in query: $q")
      }
    }
    toks += TEof
    toks.result()
  }

  def parse(q: String): Expr = parse(q, allowNameless = false)

  /** A series-API selector (`/api/v1/series` match[]): the one surface
    * where Prometheus permits a fully NAMELESS selector (`{job="x"}`)
    * — resolution is catalog-only, so no name constraint is needed.
    * Injects a match-all `__name__` matcher for the nameless case; a
    * name/__name__ CONFLICT still rejects inside [[parse]] (the
    * literal name must not be silently dropped). Non-selector
    * expressions reject loudly.
    */
  def parseSeriesSelector(q: String): Selector =
    parse(q, allowNameless = true) match {
      case s: Selector => s
      case other => throw new PromParseException(
        s"expected a plain series selector, got: $other")
    }

  private def parse(q: String, allowNameless: Boolean): Expr = {
    val toks = tokenize(q)
    var pos = 0
    def peek: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectOp(s: String): Unit = next() match {
      case TOp(`s`) => ()
      case t => throw new PromParseException(s"expected '$s', got $t in: $q")
    }

    val aggNames = Map(
      "sum" -> AggSum, "count" -> AggCount, "avg" -> AggAvg,
      "min" -> AggMin, "max" -> AggMax,
      // the rest of Prometheus' family (beyond the reference's five);
      // parameterized quantile/count_values parse in their own branch
      "stddev" -> AggStddev, "stdvar" -> AggStdvar, "group" -> AggGroup)

    // Range functions — the engine's documented extension (Ast.RangeFn).
    val rangeFnNames = Map(
      "rate" -> FnRate, "increase" -> FnIncrease, "delta" -> FnDelta,
      "avg_over_time" -> FnAvgOverTime, "min_over_time" -> FnMinOverTime,
      "max_over_time" -> FnMaxOverTime, "sum_over_time" -> FnSumOverTime,
      "count_over_time" -> FnCountOverTime, "last_over_time" -> FnLastOverTime,
      "stddev_over_time" -> FnStddevOverTime,
      "stdvar_over_time" -> FnStdvarOverTime,
      "quantile_over_time" -> FnQuantileOverTime,
      "present_over_time" -> FnPresentOverTime,
      "changes" -> FnChanges, "resets" -> FnResets,
      "idelta" -> FnIdelta, "irate" -> FnIrate, "deriv" -> FnDeriv,
      "absent_over_time" -> FnAbsentOverTime,
      "predict_linear" -> FnPredictLinear,
      "mad_over_time" -> FnMadOverTime,
      // Prometheus 3.x renamed holt_winters; both names parse
      "double_exponential_smoothing" -> FnDoubleExpSmoothing,
      "holt_winters" -> FnDoubleExpSmoothing)

    // kinds whose PromQL signature takes TRAILING numeric literals
    // (after the matrix argument): predict_linear(m[r], t),
    // double_exponential_smoothing(m[r], sf, tf)
    val trailingArgCount = Map[RangeFnKind, Int](
      FnPredictLinear -> 1, FnDoubleExpSmoothing -> 2)

    // Instant math functions — the extension's second half (Ast.InstantFn).
    val instantFnNames: Map[String, InstantFnKind] =
      (Seq(FnAbs, FnCeil, FnFloor, FnSqrt, FnExp, FnLn, FnLog2, FnLog10,
        FnSgn, FnRound, FnClamp, FnClampMin, FnClampMax,
        FnSin, FnCos, FnTan, FnAsin, FnAcos, FnAtan,
        FnSinh, FnCosh, FnTanh, FnAsinh, FnAcosh, FnAtanh, FnDeg, FnRad,
        FnMinute, FnHour, FnDayOfWeek, FnDayOfMonth, FnDayOfYear,
        FnDaysInMonth, FnMonth, FnYear): Seq[InstantFnKind])
        .map(k => k.name -> k).toMap

    def parseExpr(): Expr = parseOr()

    // PromQL precedence: `or` binds loosest, then `and`/`unless`, then
    // comparison and the arithmetic ladder.
    def parseOr(): Expr = {
      var l = parseAndUnless()
      while (peek == TIdent("or")) {
        next()
        val m = parseMatching()
        l = BinaryOp(Or, l, parseAndUnless(), m)
      }
      l
    }

    def parseAndUnless(): Expr = {
      var l = parseComparison()
      var continue = true
      while (continue) peek match {
        case TIdent(op @ ("and" | "unless")) =>
          next()
          val m = parseMatching()
          l = BinaryOp(if (op == "and") And else Unless, l, parseComparison(), m)
        case _ => continue = false
      }
      l
    }

    // Optional subquery suffix `[range:step]` after a function call —
    // the ':' rides the following ident token (identRe admits ':'), so
    // the step is parsed out of it.
    def subquerySuffix(e: Expr): Expr =
      if (peek != TOp("[")) e
      else {
        next()
        val r = next() match {
          case TDur(ms) if ms > 0 => ms
          case t => throw new PromParseException(
            s"expected a duration in subquery [...], got $t in: $q")
        }
        val s = next() match {
          case TIdent(step) if step.startsWith(":") && step.length > 1 =>
            tokenize(step.drop(1)) match {
              case Vector(TDur(ms), TEof) if ms > 0 => ms
              case _ => throw new PromParseException(
                s"expected a step duration after ':' in subquery, got '$step' in: $q")
            }
          case t => throw new PromParseException(
            s"subquery needs [range:step] (step is required — this engine " +
              s"has no default eval interval), got $t in: $q")
        }
        expectOp("]")
        // optional trailing `offset <dur>` — the PromQL subquery time
        // shift: the inner evaluation range moves back, results report
        // on the outer clock (`@` after a subquery stays unsupported
        // and falls through to the loud trailing-token error)
        var off = 0L
        if (peek == TIdent("offset")) {
          next()
          off = next() match {
            case TDur(ms) => ms
            case TOp("-") => next() match {
              case TDur(ms) => -ms
              case t => throw new PromParseException(s"bad subquery offset: $t")
            }
            case t => throw new PromParseException(s"bad subquery offset: $t")
          }
        }
        SubqueryMatrix(e, r, s, off)
      }

    // `( l1, l2, ... )` — the label list of a grouping or matching clause
    def parenLabelList(clause: String): List[String] = {
      expectOp("(")
      val labels = List.newBuilder[String]
      var continue = peek != TOp(")")
      while (continue) {
        next() match {
          case TIdent(l) => labels += l
          case t => throw new PromParseException(
            s"expected a label name in $clause, got $t in: $q")
        }
        peek match {
          case TOp(",") => next()
          case _ => continue = false
        }
      }
      expectOp(")")
      labels.result()
    }

    // A `by (...)` / `without (...)` clause at the cursor, if present.
    def peekGrouping(): Option[Grouping] = peek match {
      case TIdent("by") | TIdent("without") =>
        val by = next() match {
          case TIdent("by") => true
          case _ => false
        }
        Some(Grouping(by, parenLabelList("grouping")))
      case _ => None
    }

    // An `on (...)` / `ignoring (...)` vector-matching modifier right
    // after a binary operator, optionally followed by
    // `group_left`/`group_right` with an optional label-carry list —
    // `group_left(meta)`, the metadata-join idiom. Like Prometheus, a
    // `(` straight after group_left/right ALWAYS reads as the carry
    // list (a parenthesized RHS there needs the carry list spelled,
    // even empty: `group_left () (expr)`).
    def parseMatching(): Option[VectorMatch] = peek match {
      case TIdent("on") | TIdent("ignoring") =>
        val on = next() == TIdent("on")
        val labels = parenLabelList(if (on) "on" else "ignoring")
        val (card, carry) = peek match {
          case TIdent(g @ ("group_left" | "group_right")) =>
            next()
            val cs =
              if (peek == TOp("(")) parenLabelList(g) else Nil
            ((if (g == "group_left") ManyToOne else OneToMany): MatchCard, cs)
          case _ => (OneToOne: MatchCard, Nil)
        }
        Some(VectorMatch(on, labels, card, carry))
      case _ => None
    }

    def parseComparison(): Expr = {
      var l = parseAdditive()
      var continue = true
      while (continue) peek match {
        case TOp(op @ ("==" | "!=" | ">" | "<" | ">=" | "<=")) =>
          next()
          val base = op match {
            case "==" => Eq; case "!=" => Ne; case ">" => Gt
            case "<" => Lt; case ">=" => Ge; case "<=" => Le
          }
          // `> bool` — the modifier reads before any on/ignoring clause
          val kind =
            if (peek == TIdent("bool")) { next(); BoolCmp(base) } else base
          val m = parseMatching()
          l = BinaryOp(kind, l, parseAdditive(), m)
        case _ => continue = false
      }
      l
    }

    def parseAdditive(): Expr = {
      var l = parseMultiplicative()
      var continue = true
      while (continue) peek match {
        case TOp(op @ ("+" | "-")) =>
          next()
          val m = parseMatching()
          l = BinaryOp(if (op == "+") Add else Sub, l, parseMultiplicative(), m)
        case _ => continue = false
      }
      l
    }

    def parseMultiplicative(): Expr = {
      var l = parseUnary()
      var continue = true
      while (continue) peek match {
        case TOp(op @ ("*" | "/" | "%")) =>
          next()
          val kind = op match { case "*" => Mul; case "/" => Div; case _ => Mod }
          val m = parseMatching()
          l = BinaryOp(kind, l, parseUnary(), m)
        case TIdent("atan2") => // keyword operator, the *,/,% level
          next()
          val m = parseMatching()
          l = BinaryOp(Atan2, l, parseUnary(), m)
        case _ => continue = false
      }
      l
    }

    def parseUnary(): Expr = peek match {
      case TOp("-") =>
        next()
        parseUnary() match {
          case NumberLit(v) => NumberLit(-v)
          case e => BinaryOp(Sub, NumberLit(0), e) // -vec ≡ 0 - vec
        }
      case _ => parsePower()
    }

    // `^` binds tightest of the binary ops and is RIGHT-associative
    // (2^3^2 = 2^(3^2)); unary minus binds looser (-2^2 = -(2^2)) but
    // may open the right operand (2^-3), both per the PromQL grammar.
    def parsePower(): Expr = {
      val l = parseAtom()
      if (peek == TOp("^")) {
        next()
        val m = parseMatching()
        BinaryOp(Pow, l, parseUnary(), m)
      } else l
    }

    def parseAtom(): Expr = next() match {
      case TNum(v) => NumberLit(v)
      case TOp("(") =>
        val e = parseExpr()
        expectOp(")")
        // `(expr)[range:step]` — the subquery form over a parenthesized
        // composition, e.g. (rate(a[1d])/rate(b[1d]))[3d:12h]
        subquerySuffix(e)
      case TIdent(name) if aggNames.contains(name) &&
          (peek == TOp("(") || peek == TIdent("by") || peek == TIdent("without")) =>
        // `by (...)` / `without (...)` in either PromQL position —
        // prefix `sum by (u) (expr)` or suffix `sum(expr) by (u)` — is
        // EVALUATED (Expr.Grouping), where the reference parses then
        // drops the clause (planner.rs:84-88).
        val prefix = peekGrouping()
        expectOp("(")
        val child = parseExpr()
        expectOp(")")
        val suffix = peekGrouping()
        if (prefix.isDefined && suffix.isDefined) throw new PromParseException(
          s"$name has two grouping clauses in: $q")
        // `sum(expr)[range:step]` — aggregates take the subquery
        // suffix like any instant-vector expression (the most-typed
        // Prometheus rule shape, max_over_time(sum(rate(m[5m]))[1h:5m]))
        subquerySuffix(Aggregate(aggNames(name), child, prefix.orElse(suffix)))
      case TIdent(fn @ ("quantile" | "count_values"))
          if peek == TOp("(") || peek == TIdent("by") || peek == TIdent("without") =>
        // parameterized aggregates: `quantile(0.9, m)` (numeric-literal
        // φ) and `count_values("label", m)` (string label); grouping in
        // either position like the plain aggregates
        val prefix = peekGrouping()
        expectOp("(")
        val kind: AggKind = fn match {
          case "quantile" =>
            val phi = next() match {
              case TNum(v) => v
              case TOp("-") => next() match {
                case TNum(v) => -v
                case t => throw new PromParseException(
                  s"bad quantile argument: $t in: $q")
              }
              case t => throw new PromParseException(
                s"quantile takes a numeric literal first, got $t in: $q")
            }
            AggQuantile(phi)
          case _ =>
            next() match {
              case TStr(label) => AggCountValues(label)
              case t => throw new PromParseException(
                s"""count_values takes a string label first ("label", v), got $t in: $q""")
            }
        }
        expectOp(",")
        val child = parseExpr()
        expectOp(")")
        val suffix = peekGrouping()
        if (prefix.isDefined && suffix.isDefined) throw new PromParseException(
          s"$fn has two grouping clauses in: $q")
        subquerySuffix(Aggregate(kind, child, prefix.orElse(suffix)))
      case TIdent(fn @ ("topk" | "bottomk"))
          if peek == TOp("(") || peek == TIdent("by") || peek == TIdent("without") =>
        // grouping in either position, like the aggregates:
        // `topk by (u) (3, m)` / `topk(3, m) by (u)`
        val prefix = peekGrouping()
        expectOp("(")
        val k = parseExpr()
        expectOp(",")
        val child = parseExpr()
        expectOp(")")
        val suffix = peekGrouping()
        if (prefix.isDefined && suffix.isDefined) throw new PromParseException(
          s"$fn has two grouping clauses in: $q")
        subquerySuffix(GetK(fn == "topk", k, child, prefix.orElse(suffix)))
      case TIdent(fn @ ("limitk" | "limit_ratio")) if peek == TOp("(") =>
        // sampling aggregators (no grouping clause — the pooled model
        // takes a grouped CHILD: limitk(2, sum by (s) (m)))
        expectOp("(")
        val node: Expr = fn match {
          case "limitk" =>
            val k = parseExpr()
            expectOp(",")
            val child = parseExpr()
            expectOp(")")
            LimitK(k, child)
          case _ =>
            val r = next() match {
              case TNum(v) => v
              case TOp("-") => next() match {
                case TNum(v) => -v
                case t => throw new PromParseException(
                  s"bad limit_ratio argument: $t in: $q")
              }
              case t => throw new PromParseException(
                s"limit_ratio takes a numeric literal first, got $t in: $q")
            }
            expectOp(",")
            val child = parseExpr()
            expectOp(")")
            LimitRatio(r, child)
        }
        peek match {
          case TIdent("by") | TIdent("without") =>
            throw new PromParseException(
              s"$fn takes no grouping clause — group the CHILD " +
                s"($fn(k, sum by (s) (m))) in: $q")
          case _ => ()
        }
        subquerySuffix(node)
      case TIdent(fn) if instantFnNames.contains(fn) && peek == TOp("(") =>
        next() // consume '('
        val kind = instantFnNames(fn)
        val child = parseExpr()
        val args = List.newBuilder[Double]
        while (peek == TOp(",")) {
          next()
          args += (next() match {
            case TNum(v) => v
            case TOp("-") => next() match {
              case TNum(v) => -v
              case t => throw new PromParseException(s"bad $fn argument: $t")
            }
            case t => throw new PromParseException(
              s"$fn arguments must be numeric literals, got $t in: $q")
          })
        }
        expectOp(")")
        val got = args.result()
        val ok = kind.arity match {
          case -1 => got.size <= 1 // round([to])
          case n => got.size == n
        }
        if (!ok) throw new PromParseException(
          s"$fn expects ${if (kind.arity == -1) "0 or 1" else kind.arity.toString} " +
            s"numeric argument(s), got ${got.size} in: $q")
        subquerySuffix(InstantFn(kind, child, got))
      case TIdent(fn) if rangeFnNames.contains(fn) && peek == TOp("(") =>
        next() // consume '('
        val kind = rangeFnNames(fn)
        // quantile_over_time is the one kind with PromQL's leading scalar:
        // quantile_over_time(φ, m[r]). φ must be a numeric literal.
        val fnArgs = if (kind == FnQuantileOverTime) {
          val phi = next() match {
            case TNum(v) => v
            case TOp("-") => next() match {
              case TNum(v) => -v
              case t => throw new PromParseException(s"bad $fn quantile: $t")
            }
            case t => throw new PromParseException(
              s"$fn requires a numeric quantile first argument, got $t in: $q")
          }
          expectOp(",")
          List(phi)
        } else Nil
        val child = parseExpr()
        val tailArgs = (1 to trailingArgCount.getOrElse(kind, 0)).map { _ =>
          expectOp(",")
          next() match {
            case TNum(v) => v
            case TOp("-") => next() match {
              case TNum(v) => -v
              case t => throw new PromParseException(s"bad $fn argument: $t")
            }
            case t => throw new PromParseException(
              s"$fn requires numeric literal trailing argument(s), got $t in: $q")
          }
        }.toList
        expectOp(")")
        child match {
          case _: MatrixSelector | _: SubqueryMatrix =>
            subquerySuffix(RangeFn(kind, child, fnArgs ++ tailArgs))
          case _ => throw new PromParseException(
            s"$fn requires a matrix argument (metric[duration] or a " +
              s"subquery expr[range:step]) in: $q")
        }
      case TIdent("histogram_quantile") if peek == TOp("(") =>
        // histogram_quantile(φ, grouped-bucket-vector) — φ is a numeric
        // literal, like the engine's other quantiles
        next()
        val phi = next() match {
          case TNum(v) => v
          case TOp("-") => next() match {
            case TNum(v) => -v
            case t => throw new PromParseException(
              s"bad histogram_quantile quantile: $t")
          }
          case t => throw new PromParseException(
            s"histogram_quantile takes a numeric quantile first, got $t in: $q")
        }
        expectOp(",")
        val child = parseExpr()
        expectOp(")")
        HistogramQuantile(phi, child)
      case TIdent("label_replace") if peek == TOp("(") =>
        next()
        val child = parseExpr()
        val args = (1 to 4).map { _ =>
          expectOp(",")
          next() match {
            case TStr(s) => s
            case t => throw new PromParseException(
              s"label_replace takes string arguments (v, dst, replacement, " +
                s"src, regex), got $t in: $q")
          }
        }
        expectOp(")")
        LabelReplace(child, args(0), args(1), args(2), args(3))
      case TIdent("label_join") if peek == TOp("(") =>
        next()
        val child = parseExpr()
        val strs = List.newBuilder[String]
        while (peek == TOp(",")) {
          next()
          strs += (next() match {
            case TStr(s) => s
            case t => throw new PromParseException(
              s"label_join takes string arguments (v, dst, sep, srcs...), " +
                s"got $t in: $q")
          })
        }
        expectOp(")")
        val got = strs.result()
        if (got.size < 3) throw new PromParseException(
          s"label_join needs a dst, a separator, and at least one source " +
            s"label, got ${got.size} string argument(s) in: $q")
        LabelJoin(child, got.head, got(1), got.drop(2))
      case TIdent(fn @ ("sort" | "sort_desc")) if peek == TOp("(") =>
        next()
        val child = parseExpr()
        expectOp(")")
        Sort(fn == "sort_desc", child)
      case TIdent(fn @ ("sort_by_label" | "sort_by_label_desc"))
          if peek == TOp("(") =>
        next()
        val child = parseExpr()
        val labels = List.newBuilder[String]
        while (peek == TOp(",")) {
          next()
          labels += (next() match {
            case TStr(s) => s
            case t => throw new PromParseException(
              s"$fn takes quoted label names after the vector, got $t")
          })
        }
        expectOp(")")
        val ls = labels.result()
        if (ls.isEmpty) throw new PromParseException(
          s"$fn needs at least one label name in: $q")
        SortByLabel(fn == "sort_by_label_desc", child, ls)
      case TIdent("timestamp") if peek == TOp("(") =>
        next()
        val child = parseExpr()
        expectOp(")")
        TimestampFn(child)
      case TIdent("absent") if peek == TOp("(") =>
        next()
        val child = parseExpr()
        expectOp(")")
        AbsentFn(child)
      case TIdent("pi") if peek == TOp("(") =>
        next()
        expectOp(")")
        NumberLit(math.Pi)
      case TIdent("time") if peek == TOp("(") =>
        next()
        expectOp(")")
        TimeFn
      case TIdent("scalar") if peek == TOp("(") =>
        next()
        val child = parseExpr()
        expectOp(")")
        ScalarFn(child)
      case TIdent("vector") if peek == TOp("(") =>
        next()
        val child = parseExpr()
        expectOp(")")
        VectorFn(child)
      case TIdent(fn) if peek == TOp("(") =>
        throw new PromParseException(s"unsupported function call: $fn (reference rejects Call exprs)")
      case TIdent(name) => parseSelectorTail(name)
      case TOp("{") =>
        // nameless selector `{__name__=~"a|b", ...}` — cross-metric
        // selection; the name constraint rides in as a __name__ matcher
        pos -= 1
        parseSelectorTail("")
      case t => throw new PromParseException(s"unexpected token $t in: $q")
    }

    def parseSelectorTail(name: String): Expr = {
      var matchers = List.newBuilder[Matcher]
      if (peek == TOp("{")) {
        next()
        var continue = peek != TOp("}")
        while (continue) {
          val label = next() match {
            case TIdent(s) => s
            case t => throw new PromParseException(s"expected label name, got $t")
          }
          val op = next() match {
            case TOp("=") | TOp("==") => MatchEq
            case TOp("!=") => MatchNe
            case TOp("=~") => MatchRe
            case TOp("!~") => MatchNre
            case t => throw new PromParseException(s"expected matcher op, got $t")
          }
          val v = next() match {
            case TStr(s) => s
            case t => throw new PromParseException(s"expected quoted label value, got $t")
          }
          if (op == MatchRe || op == MatchNre) {
            // reject bad patterns at parse time, where the error can name
            // the matcher, instead of deep inside the scan filter
            try java.util.regex.Pattern.compile(v)
            catch { case e: java.util.regex.PatternSyntaxException =>
              throw new PromParseException(
                s"invalid regex in matcher $label${op.sym}\"$v\": ${e.getMessage}")
            }
          }
          matchers += Matcher(label, v, op)
          peek match {
            case TOp(",") => next()
            case _ => continue = false
          }
        }
        expectOp("}")
      }
      // optional matrix range `[5m]` — before the modifiers, as in PromQL
      // (`metric{...}[5m] offset 1h`)
      var rangeMs: Option[Long] = None
      if (peek == TOp("[")) {
        next()
        rangeMs = Some(next() match {
          case TDur(ms) if ms > 0 => ms
          case t => throw new PromParseException(s"expected a duration in [...], got $t in: $q")
        })
        expectOp("]")
      }
      // modifiers, either order: `@ ...` and/or `offset <dur>`
      var at: Option[AtMod] = None
      var offsetMs = 0L
      var scanning = true
      while (scanning) peek match {
        case TOp("@") =>
          next()
          at = Some(next() match {
            case TNum(v) => AtTime((v * 1000).toLong) // PromQL @ is unix seconds
            case TIdent("start") => expectOp("("); expectOp(")"); AtStart
            case TIdent("end") => expectOp("("); expectOp(")"); AtEnd
            case t => throw new PromParseException(s"bad @ modifier: $t")
          })
        case TIdent("offset") =>
          next()
          offsetMs = next() match {
            case TDur(ms) => ms
            case TOp("-") => next() match {
              case TDur(ms) => -ms
              case t => throw new PromParseException(s"bad offset: $t")
            }
            case t => throw new PromParseException(s"bad offset: $t")
          }
        case _ => scanning = false
      }
      val ms0 = matchers.result()
      val ms =
        if (name.isEmpty && !ms0.exists(_.label == "__name__")) {
          if (!allowNameless) throw new PromParseException(
            s"a nameless selector needs a __name__ matcher in: $q")
          // series-API entry: catalog-only resolution, so a match-all
          // name constraint is the faithful reading of namelessness
          Matcher("__name__", ".*", MatchRe) :: ms0
        } else ms0
      if (name.nonEmpty && ms.exists(_.label == "__name__"))
        throw new PromParseException(
          s"metric name $name and a __name__ matcher conflict " +
            s"(Prometheus rejects the duplicate name constraint) in: $q")
      val sel = Selector(name, ms, at, offsetMs)
      rangeMs match {
        case Some(ms) => MatrixSelector(sel, ms)
        case None => sel
      }
    }

    val e = parseExpr()
    if (peek != TEof) throw new PromParseException(s"trailing tokens at $pos in: $q")
    e
  }
}
