package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-scan text normalization: lowercase ASCII, replace every char
  * outside [a-z0-9 ] with a space, collapse space runs, trim.
  *
  * Semantically identical to the regex chain
  * `trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9 ]', ' '), ' +', ' '))`
  * (the DuckDB-oracle formulation, which stays the oracle SQL), but one
  * pass with no regex machinery — the chain costs three full regex
  * scans per document per use and dominates every text query.
  * Non-ASCII bytes are non-matching, so they become spaces — same as
  * the oracle's `[^a-z0-9 ]` on codepoints.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** Static kernel shared by interpreted and generated code paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c0 = str.charAt(i)
      // Char.toLower on the codepoint start; [^a-z0-9 ] → space
      val c = Character.toLowerCase(c0)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep) {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  def normText(c: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(c)))
}
