package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low `bits` bits of two
  * non-negative longs: output bit 2i is x's bit i, output bit 2i+1 is
  * y's bit i. The locality key behind multi-dimensional data CLUSTERING
  * at scale: rows sorted (or range-partitioned) by the Z-value land so
  * that any contiguous run of the key space is a small axis-aligned
  * rectangle in (x, y) — per-file min/max statistics on BOTH dimensions
  * then stay tight, and a predicate on either dimension prunes files.
  * A plain `ORDER BY x, y` layout keeps y-stats degenerate (each x run
  * spans all of y); Z-order bounds both.
  *
  * Engine-portable by construction: pure bit arithmetic on BIGINT, so a
  * SQL oracle reproduces it with an unrolled shift-mask-or expression.
  * Inputs are masked to `bits` bits first (callers bucket/clamp their
  * dimensions beforehand; with the masks the expression never sees a
  * negative shift and the result fits 2·bits ≤ 62 bits, never signed-
  * overflowing). One codegen node per row — the key rides the scan.
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"zorder_key expects two bigint args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  def interleave(x: Long, y: Long): Long = {
    val mask = (1L << bits) - 1
    val xm = x & mask
    val ym = y & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((xm >>> i) & 1L) << (2 * i)
      z |= ((ym >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zorder", this, classOf[ZOrderKey].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $self.interleave($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  /** Column API: Morton/Z-order interleave of the low `bits` bits of
    * two non-negative bigint columns. */
  def zOrderKey(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.column(ZOrderKey(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y), bits))
}
