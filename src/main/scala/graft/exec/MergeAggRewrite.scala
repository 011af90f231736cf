package graft.exec

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Decomposition of an ANALYZED `Aggregate` over a SIGNED, JOINED
  * changelog batch into the merge-on-write form the snapshot-join
  * aggregate path executes (`StreamingStatementRunner.startMergeAgg`):
  *
  *  - `delta`: the per-micro-batch plan — group keys plus one MERGEABLE
  *    RAW per aggregate component (`__r0..`, each a signed sum that
  *    composes under `+` across batches) plus the group-liveness delta
  *    `__net = sum(__sign)`.
  *  - `emit(i)`: for each agg-derived output position, the original
  *    output expression with every aggregate call substituted by an
  *    [[UnresolvedAttribute]] reference to its merged raw column — so
  *    `CAST(sum(x) AS DOUBLE)` merges the exact decimal raw and applies
  *    the cast at emit, never merging a rounded double.
  *
  * Raw forms (same signed algebra as [[RetractAggRewrite]]):
  * `count(...)` → one long raw; `sum(e)` → one raw of e's sum type
  * (signed by type-exact negation); `avg(e)` → TWO raws (signed sum +
  * signed non-null count) divided at emit. min/max/first/collect and
  * DISTINCT are rejected — they do not compose under `+`.
  *
  * An agg-derived output may reference only aggregates and literals:
  * a group-key attribute inside it would be unresolvable against the
  * merged frame (reject loudly; move the arithmetic to a consumer).
  */
object MergeAggRewrite {

  final case class MergeForm(
      delta: LogicalPlan,
      /** total visible outputs (= positional target columns) */
      visibleCount: Int,
      /** positions among visible outputs that are group-key columns,
        * in output order */
      keyPositions: Seq[Int],
      /** agg-derived position → emit expression over merged columns */
      emit: Map[Int, Expression],
      /** hidden mergeable raw column names, in delta-output order */
      rawNames: Seq[String],
      /** raw column types (stable across batches — same select) */
      rawTypes: Seq[DataType])

  def apply(plan: LogicalPlan, driver: String): MergeForm = plan match {
    case agg: Aggregate =>
      val sign = agg.child.output.find(_.name == RetractAggRewrite.SignCol).getOrElse(
        throw new IllegalArgumentException(
          s"merge aggregate over $driver: the select hides the driver's " +
            "changelog sign (a FROM-subquery projection?) — join and " +
            "aggregate the table directly (WHERE filters are fine)"))
      val signL = Cast(sign, LongType)
      def signed(child: Expression): Expression =
        If(GreaterThan(sign, Literal(0)), child, UnaryMinus(child))

      val raws = scala.collection.mutable.ArrayBuffer.empty[(String, NamedExpression, DataType)]
      def newRaw(deltaAgg: AggregateFunction): UnresolvedAttribute = {
        val name = s"__r${raws.size}"
        val ae = AggregateExpression(deltaAgg, Complete, isDistinct = false)
        raws += ((name, Alias(ae, name)(), ae.dataType))
        UnresolvedAttribute.quoted(name)
      }

      def substitute(e: Expression): Expression = e match {
        case ae: AggregateExpression =>
          require(!ae.isDistinct,
            s"merge aggregate over $driver: DISTINCT aggregates are not " +
              "retractable — aggregate the upstream append feed instead")
          require(ae.filter.isEmpty,
            s"merge aggregate over $driver: FILTER clauses are unsupported " +
              "on this path — move the predicate to WHERE")
          ae.aggregateFunction match {
            case c: Count =>
              val nonLit = c.children.filterNot(_.foldable)
              val term: Expression =
                if (nonLit.isEmpty) signL
                else If(nonLit.map(IsNotNull(_): Expression).reduce(And(_, _)),
                  signL, Literal(0L))
              newRaw(Sum(term))
            case s: Sum =>
              newRaw(Sum(signed(s.child)))
            case a: Average =>
              val num = newRaw(Sum(signed(a.child)))
              val den = newRaw(Sum(If(IsNotNull(a.child), signL, Literal(0L))))
              val denD = Cast(den, DoubleType)
              Cast(If(EqualTo(denD, Literal(0.0d)),
                Literal(null, DoubleType),
                Divide(Cast(num, DoubleType), denD)), a.dataType)
            case other =>
              throw new IllegalArgumentException(
                s"merge aggregate over $driver: ${other.prettyName} is not " +
                  "sum-decomposable (retracting needs the full value multiset) " +
                  "— supported: count, sum, avg")
          }
        case other => other.mapChildren(substitute)
      }

      val keyPositions = scala.collection.mutable.ArrayBuffer.empty[Int]
      val keyOuts = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
      val emit = scala.collection.mutable.Map.empty[Int, Expression]
      agg.aggregateExpressions.zipWithIndex.foreach { case (ne, i) =>
        val hasAgg = ne.exists(_.isInstanceOf[AggregateExpression])
        if (!hasAgg) {
          keyPositions += i
          keyOuts += ne
        } else {
          val template = substitute(ne) match {
            case a: Alias => a.child // emit re-aliases to the target name
            case other => other
          }
          // after substitution only literals + merged-column refs may
          // remain: a group-key attribute inside an agg output has no
          // binding in the merged frame
          template.foreach {
            case ar: AttributeReference => throw new IllegalArgumentException(
              s"merge aggregate over $driver: output ${ne.name} mixes the " +
                s"group key ${ar.name} into an aggregate expression — emit " +
                "the key and the aggregate as separate columns and combine " +
                "downstream")
            case _ =>
          }
          emit(i) = template
        }
      }
      val net = Alias(
        AggregateExpression(Sum(signL), Complete, isDistinct = false),
        RetractAggRewrite.NetCol)()
      val delta = agg.copy(aggregateExpressions =
        (keyOuts ++ raws.map(_._2) :+ net).toSeq)
      MergeForm(delta, agg.aggregateExpressions.size, keyPositions.toSeq,
        emit.toMap, raws.map(_._1).toSeq, raws.map(_._3).toSeq)

    case other =>
      throw new IllegalArgumentException(
        s"merge aggregate over $driver: only a top-level GROUP BY select is " +
          s"supported (got ${other.nodeName} above the aggregate) — move " +
          "HAVING/ORDER BY logic to a consumer of the target table")
  }
}
