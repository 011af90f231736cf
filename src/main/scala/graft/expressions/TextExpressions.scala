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
  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val Spaces = java.util.regex.Pattern.compile(" +")

  /** Static kernel shared by interpreted and generated code paths.
    * ASCII fast path = single scan; any non-ASCII input falls back to
    * the exact JDK lower+regex pipeline (what Spark's own
    * lower/regexp_replace execute), because per-char lowercasing
    * diverges from full-string lowercasing for characters like U+0130
    * whose lowercase is multi-char. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c0 = str.charAt(i)
      if (c0 >= 0x80) return normalizeSlow(str)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
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

  private def normalizeSlow(str: String): UTF8String = {
    val lowered = str.toLowerCase(java.util.Locale.ROOT)
    val stripped = NonAlnum.matcher(lowered).replaceAll(" ")
    UTF8String.fromString(Spaces.matcher(stripped).replaceAll(" ").trim)
  }

  def normText(c: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(c)))
}
