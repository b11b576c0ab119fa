package graft.tsdb

/** PromQL-subset AST mirroring the reference's supported surface
  * (tachyon_core/src/query/planner.rs:84-261): number literals, vector
  * selectors with equality matchers and @/offset modifiers, binary
  * arithmetic/comparison, sum/count/avg/min/max, topk/bottomk.
  * Everything else (subqueries, calls, strings) is a parse/plan error,
  * as in the reference — with ONE documented extension: matrix selectors
  * inside range functions ([[Expr.RangeFn]]), which the reference has no
  * analogue for. A matrix selector outside a range function (or a range
  * function over anything else) stays an error.
  */
sealed trait Expr

object Expr {
  final case class NumberLit(v: Double) extends Expr

  /** `@` resolution per planner.rs:162-180: Start→0, End→Long.MaxValue
    * (u64::MAX clamps to Long range here), At(t)→epoch-ms; `offset` only
    * applies when `@` is present (it shifts the resolved start).
    */
  sealed trait AtMod
  case object AtStart extends AtMod
  case object AtEnd extends AtMod
  final case class AtTime(epochMs: Long) extends AtMod

  /** Matcher operator. The reference's index only probes exact
    * (name,value) pairs (indexer.rs:73-91) so it treats every op as
    * `=`; this engine evaluates the full Prometheus matcher algebra —
    * `=`, `!=`, `=~`, `!~` — because the label set lives on each row
    * (a row-local predicate) and in the metadata-sized catalog (a
    * driver-side predicate), so none of the ops cost more than
    * equality at scan time.
    */
  sealed trait MatchOp { def sym: String }
  case object MatchEq extends MatchOp { val sym = "=" }
  case object MatchNe extends MatchOp { val sym = "!=" }
  case object MatchRe extends MatchOp { val sym = "=~" }
  case object MatchNre extends MatchOp { val sym = "!~" }

  /** A single label matcher. Prometheus semantics throughout: a series
    * that lacks the label is matched as if the label's value were ""
    * (so `{l=""}` and `{l!~".+"}` select series WITHOUT the label).
    * Regexes are fully anchored (`\A(?:re)\z`), as Prometheus anchors
    * with `^(?:re)$`. Deviation, documented: patterns compile with
    * java.util.regex, not RE2 — backreferences are accepted rather
    * than rejected, and pathological patterns can backtrack; Spark's
    * `rlike` uses the same engine, so the row-local filter and the
    * catalog predicate agree by construction.
    */
  final case class Matcher(label: String, value: String,
      op: MatchOp = MatchEq) {
    /** The anchored pattern string (regex ops only). */
    def anchored: String = "\\A(?:" + value + ")\\z"

    @transient private lazy val pattern =
      java.util.regex.Pattern.compile(anchored)

    /** The op applied to one concrete value. */
    def matchesValue(v: String): Boolean = op match {
      case MatchEq => v == value
      case MatchNe => v != value
      case MatchRe => pattern.matcher(v).matches()
      case MatchNre => !pattern.matcher(v).matches()
    }

    /** Driver-side predicate over a catalog label set. */
    def matches(labels: Map[String, String]): Boolean =
      matchesValue(labels.getOrElse(label, ""))
  }

  final case class Selector(
      name: String,
      matchers: List[Matcher],
      at: Option[AtMod],
      offsetMs: Long) extends Expr

  sealed trait BinKind
  case object Add extends BinKind
  case object Sub extends BinKind
  case object Mul extends BinKind
  case object Div extends BinKind
  case object Mod extends BinKind
  case object Eq extends BinKind
  case object Ne extends BinKind
  case object Gt extends BinKind
  case object Lt extends BinKind
  case object Ge extends BinKind
  case object Le extends BinKind

  // PromQL's logical/set operators (lowest precedence: or, then
  // and/unless) — beyond the reference's arithmetic/comparison surface.
  // Vector-only (scalar operands reject, as in Prometheus); the match
  // key is the timestamp for plain vectors (this engine's V2V rule) and
  // the group columns (or an explicit on/ignoring subset) for grouped
  // operands.
  case object And extends BinKind
  case object Or extends BinKind
  case object Unless extends BinKind

  // `^` (right-associative, binds tightest of the binary ops) and
  // `atan2` (the *,/,% precedence level) — PromQL's remaining two
  // arithmetic operators. Both always compute in Float64, like Go's
  // math.Pow / math.Atan2.
  case object Pow extends BinKind
  case object Atan2 extends BinKind

  /** Prometheus' `bool` modifier: `a > bool b` turns the comparison
    * into arithmetic — every element survives and the value becomes
    * 1.0 (true) or 0.0 (false). Wrapping the comparison kind keeps the
    * whole binary dispatch untouched: a BoolCmp is NOT isComparison,
    * so it routes through the arithmetic arms, which is exactly its
    * semantics.
    */
  final case class BoolCmp(cmp: BinKind) extends BinKind {
    require(isComparison(cmp), s"bool modifier needs a comparison, got $cmp")
  }

  def isComparison(k: BinKind): Boolean = k match {
    case Eq | Ne | Gt | Lt | Ge | Le => true
    case _ => false
  }

  def isSetOp(k: BinKind): Boolean = k match {
    case And | Or | Unless => true
    case _ => false
  }

  /** Cardinality of an explicit vector-matching modifier: one-to-one
    * (`on (ks)` alone), many-to-one (`group_left` — the LEFT operand
    * keeps its finer grouping), one-to-many (`group_right`, the mirror).
    */
  sealed trait MatchCard
  case object OneToOne extends MatchCard
  case object ManyToOne extends MatchCard
  case object OneToMany extends MatchCard

  /** PromQL vector matching on a binary operator — `on (ks)` /
    * `ignoring (ks)`, optionally `group_left`/`group_right` — accepted
    * between two GROUPED (`by`) operands: the share-of-parent shape
    * `sum by (a,b) (x) / on (a) group_left sum by (a) (y)`. The
    * reference drops grouping entirely (planner.rs:84-88), so this is
    * beyond-parity surface; see [[graft.tsdb.TsdbEngine]]'s matched
    * binary evaluation for the exact acceptance rules. `on = false`
    * means `ignoring`. `carry` is the group_left/group_right
    * label-carry list (`group_left(meta)` — extra labels copied from
    * the 'one' side, the metadata-join idiom); per-key uniqueness of
    * the carried labels is enforced at RUNTIME on the executors
    * (raise_error over the group-count-sized one side), exactly the
    * check Prometheus performs.
    */
  final case class VectorMatch(on: Boolean, labels: List[String],
      card: MatchCard, carry: List[String] = Nil)

  final case class BinaryOp(kind: BinKind, lhs: Expr, rhs: Expr,
      matching: Option[VectorMatch] = None) extends Expr

  sealed trait AggKind
  case object AggSum extends AggKind
  case object AggCount extends AggKind
  case object AggAvg extends AggKind
  case object AggMin extends AggKind
  case object AggMax extends AggKind
  // The rest of Prometheus' aggregation-operator family — beyond the
  // reference's five (planner.rs accepts only sum/count/avg/min/max)
  // but table stakes for its PromQL users. All compose with grouping,
  // nesting, and grouped binary like the original five.
  /** Population standard deviation (Prometheus' stddev rule). */
  case object AggStddev extends AggKind
  /** Population variance. */
  case object AggStdvar extends AggKind
  /** 1 for every (group with) at least one sample — Prometheus group(). */
  case object AggGroup extends AggKind
  /** φ-quantile with linear interpolation (percentile_cont's rank rule,
    * the same definition Prometheus documents); φ is a literal, bounds
    * checked at plan time.
    */
  final case class AggQuantile(phi: Double) extends AggKind
  /** count_values("label", v): one output row per distinct sample
    * value, counted — the value rendered as a STRING group column
    * named `label`. Emits a grouped result, so thresholds and grouped
    * binary compose over it.
    */
  final case class AggCountValues(label: String) extends AggKind

  /** An aggregate's `by (labels)` / `without (labels)` clause. The
    * reference parses and DROPS grouping modifiers entirely
    * (planner.rs:84-88); this engine evaluates them for real — the one
    * place every real PromQL user hits the reference's gap. `by = true`
    * groups on exactly `labels` (absent label → null group, Prometheus'
    * missing-label rule); `by = false` (`without`) groups on the full
    * label set MINUS `labels`, emitted as one canonical
    * `k=v,k=v`-encoded column.
    */
  final case class Grouping(by: Boolean, labels: List[String])

  /** Whole-range aggregate, optionally grouped ([[Grouping]]). Ungrouped
    * form emits one scalar (reference semantics); grouped form emits one
    * row per label-group — the engine's evaluated version of the clause
    * the reference parses then ignores (SURVEY §2 row 7).
    */
  final case class Aggregate(kind: AggKind, child: Expr,
      grouping: Option[Grouping] = None) extends Expr

  /** topk/bottomk, optionally grouped (`topk(3, m) by (user)` — the k
    * best samples of each group; the reference drops grouping
    * modifiers entirely, planner.rs:84-88).
    */
  final case class GetK(top: Boolean, k: Expr, child: Expr,
      grouping: Option[Grouping] = None) extends Expr

  /** Prometheus' sampling aggregators (round 13, beyond the
    * reference): `limitk(k, v)` keeps k series DETERMINISTICALLY
    * (md5 order over the group key — this engine's exact-count rule,
    * where Prometheus documents a hash-based approximate one);
    * `limit_ratio(r, v)` keeps the first round(r·n) groups for r ≥ 0
    * and the LAST round(−r·n) for r < 0, so limit_ratio(r) and
    * limit_ratio(r − 1) partition the series exactly. In the
    * pooled-series model both take a GROUPED child (a plain selector
    * is one pooled series — aggregate into groups first).
    */
  final case class LimitK(k: Expr, child: Expr) extends Expr
  final case class LimitRatio(r: Double, child: Expr) extends Expr

  /** A matrix selector `sel[range]` — valid ONLY as the immediate child
    * of a range function. The reference rejects matrix selectors
    * outright (planner.rs:84-261); this engine accepts them solely to
    * feed [[RangeFn]], and evaluating one anywhere else is a plan error
    * so the reference's rejection surface is preserved for bare use.
    */
  final case class MatrixSelector(sel: Selector, rangeMs: Long) extends Expr

  /** A PromQL subquery `expr[range:step]` — a DERIVED series: `child`
    * evaluated slidingly every `stepMs` (the [[graft.tsdb.RangeFns]]
    * sliding contract), then consumed as a matrix by an enclosing range
    * function. Valid ONLY as a range function's immediate child, like
    * [[MatrixSelector]]; `child` must be sliding-evaluable — range
    * functions over matrix selectors, optionally under instant math,
    * binary composition (`(rate(a[1d])/rate(b[1d]))[3d:12h]`, the
    * ratio-alerting shape), or set operators (`(rate(a[1d]) and
    * (rate(b[1d]) > t))[3d:12h]`, the alert-masking shape) — the same
    * scope as queryRange, and for the
    * same reason: per-step re-evaluation of arbitrary whole-range
    * expressions would rescan the store once per step, while the
    * accepted shapes scan each selector exactly once.
    */
  final case class SubqueryMatrix(child: Expr, rangeMs: Long,
      stepMs: Long, offsetMs: Long = 0L) extends Expr

  /** Range functions over a matrix selector — an ENGINE EXTENSION (the
    * reference rejects all Call exprs, planner.rs:118-123). Semantics are
    * tumbling windows of `rangeMs` aligned to the query start; see
    * [[graft.tsdb.RangeFns]] for the per-function contract.
    */
  sealed trait RangeFnKind
  case object FnRate extends RangeFnKind
  case object FnIncrease extends RangeFnKind
  case object FnDelta extends RangeFnKind
  case object FnAvgOverTime extends RangeFnKind
  case object FnMinOverTime extends RangeFnKind
  case object FnMaxOverTime extends RangeFnKind
  case object FnSumOverTime extends RangeFnKind
  case object FnCountOverTime extends RangeFnKind
  case object FnLastOverTime extends RangeFnKind
  case object FnStddevOverTime extends RangeFnKind
  case object FnStdvarOverTime extends RangeFnKind
  /** quantile_over_time(φ, m[r]) — φ is the one entry in RangeFn.args. */
  case object FnQuantileOverTime extends RangeFnKind
  case object FnPresentOverTime extends RangeFnKind
  case object FnChanges extends RangeFnKind
  case object FnResets extends RangeFnKind
  case object FnIdelta extends RangeFnKind
  case object FnIrate extends RangeFnKind
  case object FnDeriv extends RangeFnKind
  /** predict_linear(m[r], t) — the least-squares line (deriv's
    * regression) extrapolated to t seconds AFTER the row's emitted
    * timestamp (the window anchor: tumbling → window start, sliding →
    * the step instant); t is the one entry in RangeFn.args.
    */
  case object FnPredictLinear extends RangeFnKind
  /** mad_over_time — median absolute deviation (unscaled), the robust
    * dispersion Prometheus added in 3.x behind a feature flag.
    */
  case object FnMadOverTime extends RangeFnKind
  /** double_exponential_smoothing(m[r], sf, tf) — Prometheus'
    * holt_winters (renamed in 3.x; both names parse): the Holt linear
    * recurrence folded over the window's time-ordered samples with
    * smoothing factor sf and trend factor tf, both in (0, 1) exclusive
    * (checked loudly). args = List(sf, tf).
    */
  case object FnDoubleExpSmoothing extends RangeFnKind
  /** 1 for every window with NO samples — the gap detector. */
  case object FnAbsentOverTime extends RangeFnKind

  /** `args` carries the numeric literals a kind's PromQL signature takes
    * (today only quantile_over_time's φ); empty for every other kind.
    */
  final case class RangeFn(kind: RangeFnKind, child: Expr,
      args: List[Double] = Nil) extends Expr

  /** Instant (scalar-math) functions over a vector — the second half of
    * the engine's function extension (the reference rejects all calls).
    * Row-local value maps; `args` are the numeric literals PromQL's
    * signatures take (round's to_nearest, clamp's bounds). Results are
    * Float64, like PromQL's math functions.
    */
  sealed trait InstantFnKind { def name: String; def arity: Int }
  case object FnAbs extends InstantFnKind { val name = "abs"; val arity = 0 }
  case object FnCeil extends InstantFnKind { val name = "ceil"; val arity = 0 }
  case object FnFloor extends InstantFnKind { val name = "floor"; val arity = 0 }
  case object FnSqrt extends InstantFnKind { val name = "sqrt"; val arity = 0 }
  case object FnExp extends InstantFnKind { val name = "exp"; val arity = 0 }
  case object FnLn extends InstantFnKind { val name = "ln"; val arity = 0 }
  case object FnLog2 extends InstantFnKind { val name = "log2"; val arity = 0 }
  case object FnLog10 extends InstantFnKind { val name = "log10"; val arity = 0 }
  case object FnSgn extends InstantFnKind { val name = "sgn"; val arity = 0 }
  /** round(v, to=1): floor(v/to + 0.5)·to — PromQL's half-up rule. */
  case object FnRound extends InstantFnKind { val name = "round"; val arity = -1 }
  case object FnClamp extends InstantFnKind { val name = "clamp"; val arity = 2 }
  case object FnClampMin extends InstantFnKind { val name = "clamp_min"; val arity = 1 }
  case object FnClampMax extends InstantFnKind { val name = "clamp_max"; val arity = 1 }

  /** Zero-arg row-local value maps — Prometheus' trigonometry family
    * (radians, like Go's math package) plus deg/rad conversion.
    * `pi()` parses directly to NumberLit(π).
    */
  sealed abstract class MathFn(val name: String) extends InstantFnKind {
    val arity = 0
  }
  case object FnSin extends MathFn("sin")
  case object FnCos extends MathFn("cos")
  case object FnTan extends MathFn("tan")
  case object FnAsin extends MathFn("asin")
  case object FnAcos extends MathFn("acos")
  case object FnAtan extends MathFn("atan")
  case object FnSinh extends MathFn("sinh")
  case object FnCosh extends MathFn("cosh")
  case object FnTanh extends MathFn("tanh")
  case object FnAsinh extends MathFn("asinh")
  case object FnAcosh extends MathFn("acosh")
  case object FnAtanh extends MathFn("atanh")
  case object FnDeg extends MathFn("deg")
  case object FnRad extends MathFn("rad")

  /** Time-component functions — Prometheus' minute/hour/day_of_week/…
    * family: the VALUE is read as an epoch-second instant (UTC,
    * truncated toward zero like Go's time.Unix) and the named component
    * comes back as a Float64. The idiomatic call sites are
    * `hour(timestamp(m))` (per-sample local time) — this engine has no
    * single evaluation instant, so the Prometheus default argument
    * `vector(time())` has no analogue and the argument is REQUIRED.
    */
  sealed abstract class TimeComponentFn(val name: String)
      extends InstantFnKind {
    val arity = 0
  }
  case object FnMinute extends TimeComponentFn("minute")
  case object FnHour extends TimeComponentFn("hour")
  case object FnDayOfWeek extends TimeComponentFn("day_of_week")
  case object FnDayOfMonth extends TimeComponentFn("day_of_month")
  case object FnDayOfYear extends TimeComponentFn("day_of_year")
  case object FnDaysInMonth extends TimeComponentFn("days_in_month")
  case object FnMonth extends TimeComponentFn("month")
  case object FnYear extends TimeComponentFn("year")

  final case class InstantFn(kind: InstantFnKind, child: Expr,
      args: List[Double]) extends Expr

  /** histogram_quantile(φ, v) — Prometheus' bucket-interpolation
    * quantile. `child` must evaluate to a GROUPED (`by`) result whose
    * group columns include `le` (the cumulative bucket upper bound,
    * "+Inf" for the top bucket): the canonical call is
    * `histogram_quantile(0.9, sum by (job, le) (bucket_metric))`.
    * Groups are the remaining label columns; each group's buckets
    * interpolate per Prometheus' published rule (promql/quantile.go):
    * rank φ·total located in the first bucket whose cumulative count
    * reaches it, linear within [prev_le, le], the +Inf bucket answering
    * with the highest finite le, a first bucket with le ≤ 0 answering
    * its own le. φ outside [0, 1] is rejected loudly (this engine's
    * quantile policy); groups lacking a +Inf bucket or with fewer than
    * two buckets are dropped (Prometheus yields NaN with a warning).
    */
  final case class HistogramQuantile(phi: Double, child: Expr) extends Expr

  /** label_replace(v, "dst", "replacement", "src", "regex") — row-local
    * group-label rewrite over a GROUPED (`by`) result: when `regex`
    * (fully anchored, as in Prometheus) matches the `src` column, `dst`
    * becomes `replacement` with $1..$n capture expansion; otherwise the
    * row keeps its existing `dst` (or stays absent). An empty expansion
    * removes the label (null — the engine's missing-label encoding).
    */
  final case class LabelReplace(child: Expr, dst: String,
      replacement: String, src: String, regex: String) extends Expr

  /** label_join(v, "dst", "sep", "src1", ...) — `dst` = the source
    * label columns joined with `sep`, over a GROUPED (`by`) result.
    * Absent source labels contribute "" (Prometheus' rule).
    */
  final case class LabelJoin(child: Expr, dst: String, sep: String,
      srcs: List[String]) extends Expr

  /** sort(v) / sort_desc(v) — value-ordered vector output (ties by
    * timestamp, then group columns, so the order is total). Ordering is
    * PRESENTATION: a DataFrame consumer may re-shuffle it, but the CLI /
    * HTTP / CSV surfaces render in this order.
    */
  final case class Sort(desc: Boolean, child: Expr) extends Expr

  /** sort_by_label(v, "l1", ...) / sort_by_label_desc — presentation
    * ordering of a GROUPED result by its label columns (Prometheus'
    * experimental pair to sort/sort_desc). Lexicographic over the
    * given labels, value and remaining columns as tiebreaks.
    */
  final case class SortByLabel(desc: Boolean, child: Expr,
      labels: List[String]) extends Expr

  /** timestamp(v) — each sample's own timestamp in SECONDS as the value
    * (Prometheus' timestamp()); requires a result that still carries a
    * timestamp column (plain vectors and sliding/grouped step results).
    */
  final case class TimestampFn(child: Expr) extends Expr

  /** absent(v) — ONE row of value 1 when the child vector has no
    * samples in the query range, no rows otherwise (the whole-range
    * reading of Prometheus' absent(); the windowed form is
    * [[FnAbsentOverTime]]). The child must be a plain vector
    * expression — scalars and grouped results reject loudly.
    */
  final case class AbsentFn(child: Expr) extends Expr

  /** `time()`, `scalar(v)`, `vector(s)` — the eval-time bridge trio.
    * This engine evaluates one whole [start, end] range (the
    * reference's model), so "the evaluation timestamp" maps to `end`:
    * time() = end seconds; vector(s) emits one unlabeled sample AT
    * `end`; scalar(v) is the Prometheus collapse — the value when the
    * vector has exactly one element, NaN otherwise (decided in-plan,
    * no driver count).
    */
  case object TimeFn extends Expr
  final case class ScalarFn(child: Expr) extends Expr
  final case class VectorFn(child: Expr) extends Expr
}

/** The reference's value types and coercion lattice (lib.rs:54-73):
  * any Float64 operand → Float64; else any Integer64 → Integer64; else
  * UInteger64. Division and modulo always promote to Float64
  * (lib.rs:306-362).
  */
sealed trait VType
object VType {
  case object I64 extends VType
  case object U64 extends VType
  case object F64 extends VType

  def combine(a: VType, b: VType): VType =
    if (a == F64 || b == F64) F64
    else if (a == I64 || b == I64) I64
    else U64
}
