package graft.exec

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Rewrites an ANALYZED streaming `Aggregate` over a SIGNED changelog
  * (rows carry `__sign` ∈ {+1, −1}) into its retraction-folding form —
  * the aggregate-function half of Flink's retract-mode aggregation
  * (the `ChangelogNormalize` half lives in
  * `graft.streaming.ChangelogNormalize`). Each sum-decomposable
  * aggregate becomes a signed sum, so a `-1` row exactly cancels the
  * `+1` it retracts and the running state equals the aggregate over
  * the driver table's LATEST rows:
  *
  *  - `count(*)`        → `sum(__sign)`              (LongType, as count)
  *  - `count(e, ...)`   → `sum(if(e... not null, __sign, 0))`
  *  - `sum(e)`          → `sum(if(__sign > 0, e, -e))` (type-exact: the
  *                        negation preserves e's type, so DECIMAL sums
  *                        keep their precision/scale and retractions
  *                        cancel EXACTLY; doubles cancel exactly too —
  *                        same value added then subtracted)
  *  - `avg(e)`          → signed sum ÷ signed non-null count, divided
  *                        in DOUBLE for non-decimal children and in
  *                        DECIMAL for decimal children ([[aggDivide]] —
  *                        matches native `Average` exactly, ADVICE r14)
  *
  * Everything else (min/max/first/collect/percentile/distinct...) is
  * rejected LOUDLY: those need the full value multiset to retract from,
  * which is a different state contract — the runner routes such
  * shapes to the value-multiset merge path (`MergeAggRewrite`).
  *
  * A hidden `__net = sum(__sign)` aggregate is appended: when a group's
  * net count reaches 0 every member was retracted and the group must be
  * DELETED downstream (Flink emits -D; the runner turns `__net = 0`
  * into an upsert tombstone). Output attribute ids, names, and types
  * are preserved, so the rewritten plan is a drop-in for the original.
  */
object RetractAggRewrite {

  /** Column name the signed changelog stream carries. */
  val SignCol = "__sign"
  /** Arrival-order column a signed changelog stream carries: the topic
    * offset of the ADD record — the order key first/last aggregates
    * fold over. Upsert-normalized and append topic drivers carry it
    * natively; retract-mode drivers RECOVER it (a -U names only a
    * value) through the content-keyed FIFO normalizer
    * (`ChangelogNormalize.normalizeRetract`, wired by
    * `StreamingStatementRunner.signedChangelogStream` when the shape
    * needs provenance). */
  val OrdCol = "__ord"
  /** Hidden net-count column the rewrite appends (0 ⇒ group deleted). */
  val NetCol = "__net"
  /** Hidden HAVING verdict column (false ⇒ group deleted downstream). */
  val KeepCol = "__keep"

  /** The emit-side division of a decomposed average, matching Spark's
    * native `Average` result exactly (ADVICE r14): DECIMAL children
    * divide in DECIMAL — `Divide` owns decimal result-type promotion,
    * so `num / cast(den AS DECIMAL(20,0))` then a cast to avg's
    * declared result type reproduces `Average.evaluateExpression`
    * (a double-division-then-cast-back drifts in the low digits and
    * fails the type/value-exact hash gate). Non-decimal children keep
    * the double division with an explicit 0-denominator NULL guard (a
    * fully-retracted group must yield NULL — never NaN, never an ANSI
    * divide abort of the whole stream); LEGACY decimal division
    * already yields NULL on a 0 denominator. */
  private[exec] def aggDivide(num: Expression, den: Expression,
                              resultType: org.apache.spark.sql.types.DataType,
                              childType: org.apache.spark.sql.types.DataType): Expression =
    childType match {
      case _: org.apache.spark.sql.types.DecimalType =>
        Cast(Divide(num, Cast(den, org.apache.spark.sql.types.DecimalType(20, 0)),
          EvalMode.LEGACY), resultType)
      case _ =>
        val denD = Cast(den, DoubleType)
        Cast(If(EqualTo(denD, Literal(0.0d)),
          Literal(null, DoubleType),
          Divide(Cast(num, DoubleType), denD)), resultType)
    }

  /** The variance family's EXACT-MOMENT closed form over signed sums
    * (round 15): n = signed non-null count, s1 = Σ±x, s2 = Σ±x² —
    * all three retract exactly (decimal children keep their moments
    * in DECIMAL; [[MergeAggRewrite]] and [[RetractAggRewrite]] both
    * unwrap the analyzer's to-double cast to get there), then ONE
    * pinned double op order the oracle mirrors verbatim (CLAUDE.md
    * iterative-float rule): m2 = greatest(s2 − s1·s1/n, 0) — the
    * clamp kills the ±ulp-negative an all-equal group produces —
    * var = m2/(n | n−1), stddev = sqrt(var). Semantics note: this is
    * the exact-moment form, equal to Spark's native Welford-style
    * `CentralMomentAgg` up to fp noise (gates round to 6 dp). */
  private[exec] def momentForm(n0: Expression, s1: Expression, s2: Expression,
                               sample: Boolean, sqrtOut: Boolean): Expression = {
    val nD = Cast(n0, DoubleType)
    val m2 = Greatest(Seq(
      Subtract(Cast(s2, DoubleType),
        Divide(Multiply(Cast(s1, DoubleType), Cast(s1, DoubleType)), nD)),
      Literal(0.0d)))
    val den = if (sample) Subtract(nD, Literal(1.0d)) else nD
    val minN = if (sample) 1L else 0L
    val v = Divide(m2, den)
    If(LessThanOrEqual(Cast(n0, LongType), Literal(minN)),
      Literal(null, DoubleType),
      if (sqrtOut) Sqrt(v) else v)
  }

  /** covar/corr closed forms over signed co-moments (round 15): n =
    * count of rows where BOTH sides are non-null, sx = Σ±x, sy = Σ±y,
    * sxy = Σ±xy (corr adds sxx/syy) — the same pinned-double-op
    * discipline as [[momentForm]]: c2 = sxy − sx·sy/n;
    * covar_pop = c2/n, covar_samp = c2/(n−1). */
  private[exec] def coMomentForm(n0: Expression, sx: Expression, sy: Expression,
                                 sxy: Expression, sample: Boolean): Expression = {
    val nD = Cast(n0, DoubleType)
    val c2 = Subtract(Cast(sxy, DoubleType),
      Divide(Multiply(Cast(sx, DoubleType), Cast(sy, DoubleType)), nD))
    val den = if (sample) Subtract(nD, Literal(1.0d)) else nD
    val minN = if (sample) 1L else 0L
    If(LessThanOrEqual(Cast(n0, LongType), Literal(minN)),
      Literal(null, DoubleType), Divide(c2, den))
  }

  /** corr = c2 / sqrt(m2x · m2y), NULL when either variance is 0
    * (DuckDB's convention; Spark's native Corr emits NaN there — the
    * one documented divergence, chosen because NaN does not survive
    * the JSON topic encode and NULL is what the oracle engine says). */
  private[exec] def corrForm(n0: Expression, sx: Expression, sy: Expression,
                             sxy: Expression, sxx: Expression, syy: Expression): Expression = {
    val nD = Cast(n0, DoubleType)
    def m2(s2: Expression, s1: Expression) = Greatest(Seq(
      Subtract(Cast(s2, DoubleType),
        Divide(Multiply(Cast(s1, DoubleType), Cast(s1, DoubleType)), nD)),
      Literal(0.0d)))
    val c2 = Subtract(Cast(sxy, DoubleType),
      Divide(Multiply(Cast(sx, DoubleType), Cast(sy, DoubleType)), nD))
    val denom = Sqrt(Multiply(m2(sxx, sx), m2(syy, sy)))
    If(Or(LessThanOrEqual(Cast(n0, LongType), Literal(0L)),
        LessThanOrEqual(denom, Literal(0.0d))),
      Literal(null, DoubleType), Divide(c2, denom))
  }

  /** The analyzer casts a variance/stddev child to DOUBLE
    * (`CentralMomentAgg` is double-typed): unwrap a decimal-to-double
    * cast so the signed MOMENTS accumulate in exact DECIMAL and only
    * the closed form runs in double. */
  private[exec] def momentBase(child: Expression): Expression = child match {
    case c: Cast if c.dataType == DoubleType &&
      c.child.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => c.child
    case other => other
  }

  /** Normalize the analyzed shapes a `GROUP BY [...] HAVING [...]`
    * select can take into (aggregate, having-condition, visible output
    * positions):
    *  - `Aggregate` — no HAVING;
    *  - `Filter(cond, Aggregate)` — HAVING over selected outputs;
    *  - `Project(refs, Filter(cond, Aggregate))` — HAVING introduced
    *    aggregates not in the select list; the analyzer extended the
    *    Aggregate with them and projected back to the declared outputs
    *    (the Project must be pure attribute references).
    * A group whose condition stops holding must be DELETED downstream
    * (Flink retracts it), so the condition is carried OUT of the plan
    * and applied at the sink, never as an in-plan filter. */
  def unwrapHaving(plan: LogicalPlan, driver: String)
      : (Aggregate, Option[Expression], Seq[Int]) = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    def all(a: Aggregate) = a.aggregateExpressions.indices
    plan match {
      case a: Aggregate => (a, None, all(a))
      case Filter(cond, a: Aggregate) => (a, Some(cond), all(a))
      case Project(projList, Filter(cond, a: Aggregate))
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        val byId = a.aggregateExpressions.map(_.exprId).zipWithIndex.toMap
        val idx = projList.map(p => byId.getOrElse(p.exprId,
          throw new IllegalArgumentException(
            s"aggregate over $driver: HAVING projection references a " +
              "non-aggregate column — restructure the select")))
        (a, Some(cond), idx)
      case other =>
        throw new IllegalArgumentException(
          s"retract-aware aggregate over $driver: only a top-level GROUP BY " +
            s"[HAVING] select is supported (got ${other.nodeName} above the " +
            "aggregate) — move ORDER BY/subquery logic to a consumer of the " +
            "target table")
    }
  }

  def apply(plan: LogicalPlan, driver: String): LogicalPlan = plan match {
    case agg: Aggregate =>
      val sign = agg.child.output.find(_.name == SignCol).getOrElse(
        throw new IllegalArgumentException(
          s"retract-aware aggregate over $driver: the select hides the table's " +
            "changelog sign (a FROM-subquery projection?) — aggregate directly " +
            "over the table (WHERE filters are fine)"))
      val signL = Cast(sign, LongType)

      def signed(child: Expression): Expression =
        If(GreaterThan(sign, Literal(0)), child, UnaryMinus(child))

      def rewriteAgg(ae: AggregateExpression): Expression = {
        require(!ae.isDistinct,
          s"retract-aware aggregate over $driver: DISTINCT aggregates are not " +
            "retractable (a retraction cannot know whether another copy of the " +
            "value remains) — aggregate the upstream append feed instead")
        ae.aggregateFunction match {
          case c: Count =>
            val nonLit = c.children.filterNot(_.foldable)
            val term: Expression =
              if (nonLit.isEmpty) signL
              else If(nonLit.map(IsNotNull(_): Expression).reduce(And(_, _)),
                signL, Literal(0L))
            ae.copy(aggregateFunction = Sum(term))
          case s: Sum =>
            ae.copy(aggregateFunction = Sum(signed(s.child)))
          case a: Average =>
            val num = ae.copy(aggregateFunction = Sum(signed(a.child)))
            val den = AggregateExpression(
              Sum(If(IsNotNull(a.child), signL, Literal(0L))),
              ae.mode, isDistinct = false, ae.filter, NamedExpression.newExprId)
            aggDivide(num, den, a.dataType, a.child.dataType)
          // the variance family is sum-decomposable through exact
          // moments (round 15): n, Σ±x, Σ±x² retract exactly; the
          // closed form runs once at emit
          case cm @ (_: VarianceSamp | _: VariancePop |
                     _: StddevSamp | _: StddevPop) =>
            val base = momentBase(cm.asInstanceOf[CentralMomentAgg].child)
            def aexp(f: AggregateFunction): Expression = AggregateExpression(
              f, ae.mode, isDistinct = false, ae.filter, NamedExpression.newExprId)
            val s1 = aexp(Sum(signed(base)))
            val s2 = aexp(Sum(signed(Multiply(base, base))))
            val n = aexp(Sum(If(IsNotNull(base), signL, Literal(0L))))
            momentForm(n, s1, s2,
              sample = cm.isInstanceOf[VarianceSamp] || cm.isInstanceOf[StddevSamp],
              sqrtOut = cm.isInstanceOf[StddevSamp] || cm.isInstanceOf[StddevPop])
          // covariance/correlation: signed CO-moments over PAIRED
          // (both-non-null) rows — same exact-moment discipline
          case cv @ (_: CovSample | _: CovPopulation | _: Corr) =>
            val (lx, rx) = cv match {
              case c: Covariance => (momentBase(c.left), momentBase(c.right))
              case c: PearsonCorrelation => (momentBase(c.left), momentBase(c.right))
            }
            val both = And(IsNotNull(lx), IsNotNull(rx))
            def aexp(f: AggregateFunction): Expression = AggregateExpression(
              f, ae.mode, isDistinct = false, ae.filter, NamedExpression.newExprId)
            def pairedSum(e: Expression): Expression =
              aexp(Sum(If(both, signed(e), Literal(null, e.dataType))))
            val n = aexp(Sum(If(both, signL, Literal(0L))))
            val sx = pairedSum(lx)
            val sy = pairedSum(rx)
            val sxy = pairedSum(Multiply(lx, rx))
            cv match {
              case _: CovSample => coMomentForm(n, sx, sy, sxy, sample = true)
              case _: CovPopulation => coMomentForm(n, sx, sy, sxy, sample = false)
              case _ => corrForm(n, sx, sy, sxy,
                pairedSum(Multiply(lx, lx)), pairedSum(Multiply(rx, rx)))
            }
          // RuntimeReplaceableAggregate (count_if, any/every/some,
          // regr_count, ...): unwrap to the replacement and re-dispatch
          // — it either decomposes (Count/Sum/Min/Max...) or rejects
          // with its own name in the message
          case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceableAggregate =>
            r.replacement match {
              case af: AggregateFunction =>
                rewriteAgg(ae.copy(aggregateFunction = af))
              case _ => throw new IllegalArgumentException(
                s"retract-aware aggregate over $driver: ${r.prettyName} has no " +
                  "retraction decomposition")
            }
          case other =>
            throw new IllegalArgumentException(
              s"retract-aware aggregate over $driver: ${other.prettyName} is not " +
                "sum-decomposable (retracting needs the full value multiset) — " +
                "supported: count, sum, avg; aggregate the upstream append feed " +
                "for anything else")
        }
      }

      // one-pass recursion, never descending into a replacement — a
      // transformDown would re-match the signed Sum an avg rewrite
      // just produced and double-negate it
      def rw(e: Expression): Expression = e match {
        case ae: AggregateExpression => rewriteAgg(ae)
        case other => other.mapChildren(rw)
      }

      val rewritten = agg.aggregateExpressions.map(ne =>
        rw(ne).asInstanceOf[NamedExpression])
      val net = Alias(
        AggregateExpression(Sum(signL), Complete, isDistinct = false), NetCol)()
      agg.copy(aggregateExpressions = rewritten :+ net)

    case other =>
      throw new IllegalArgumentException(
        s"retract-aware aggregate over $driver: only a top-level GROUP BY " +
          s"select is supported (got ${other.nodeName} above the aggregate) — " +
          "move ORDER BY/subquery logic to a consumer of the target table")
  }
}
