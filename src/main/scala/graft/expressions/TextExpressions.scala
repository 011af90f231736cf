package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
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

/** Single-scan character-distribution stats:
  * `struct<n_chars int, n_unique int, entropy double>` over the raw
  * text's CODEPOINTS — the character-entropy quality signal (low
  * entropy = repeated-char spam / binary junk; the standard cheap
  * filter next to length and stopword ratios).
  *
  * Shannon entropy in bits, computed as
  * `H = (ln n − (Σ_c cnt_c·ln cnt_c)/n) / LN2` with the Σ folded in
  * ASCENDING codepoint order and LN2 the fixed literal
  * 0.6931471805599453 — the exact expression a SQL oracle can replay
  * term-for-term (same fold order, same constant), leaving only
  * sub-ulp libm `ln` noise for the 6-dp round to absorb (the repo's
  * metric-double rule; entropy is emitted unrounded, callers round).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_unique", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.statsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CharEntropy.statsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  /** The double nearest ln 2 — a shared LITERAL on both engines so the
    * bits-conversion divisor cannot differ by an ulp. */
  val Ln2 = 0.6931471805599453

  def statsOf(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    // histogram over codepoints; ASCII fast path = fixed array (sorted
    // by construction), otherwise a sorted map — the entropy fold must
    // run in ascending-codepoint order to match the oracle's ordered
    // list sum
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    var n = 0
    var unique = 0
    var sum = 0.0
    if (ascii) {
      val h = new Array[Int](128)
      var j = 0
      while (j < str.length) { h(str.charAt(j)) += 1; j += 1 }
      n = str.length
      var c = 0
      while (c < 128) {
        val cnt = h(c)
        if (cnt > 0) { unique += 1; sum += cnt * math.log(cnt.toDouble) }
        c += 1
      }
    } else {
      val h = new java.util.TreeMap[Integer, Integer]()
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        h.merge(cp, 1, (a, b) => a + b)
        n += 1
        j += Character.charCount(cp)
      }
      unique = h.size()
      val it = h.values().iterator()
      while (it.hasNext) { val cnt = it.next(); sum += cnt * math.log(cnt.toDouble) }
    }
    val entropy = if (n == 0) 0.0 else (math.log(n.toDouble) - sum / n) / Ln2
    org.apache.spark.sql.catalyst.InternalRow(n, unique, entropy)
  }

  def charEntropyStats(c: Column): Column =
    GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(c)))
}

/** Levenshtein distance over the two strings' UTF-8 BYTES, not their
  * code points.
  *
  * Exists for cross-engine determinism: Spark's builtin `levenshtein`
  * counts code-point edits while DuckDB's builtin counts byte edits
  * (measured: levenshtein('héllo','hello') = 1 in Spark, 2 in DuckDB —
  * 'é' is two UTF-8 bytes), so any oracle-checked edit distance over
  * raw (un-normalized) text desyncs on the first non-ASCII character.
  * Byte-level is the portable choice: identical in both engines on ANY
  * corpus, equal to code-point distance on pure-ASCII text (the
  * fixture case — adopting it changes no green hash), and a legitimate
  * near-dup metric in its own right (multibyte chars weigh their
  * encoded length). Callers pairing this with a normalized-edit-
  * distance denominator must use BYTE lengths (`octet_length` /
  * DuckDB `strlen`) so the ratio stays ≤ 1.
  *
  * Two-row DP, O(|a|·|b|) bytes — callers bound the inputs (q151 caps
  * at 400-char prefixes on capped candidate pairs). */
case class LevenshteinBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_bytes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"levenshtein_bytes expects two string args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinBytes.distOf(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.LevenshteinBytes.distOf($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinBytes {
  /** Static kernel shared by interpreted and generated paths. */
  def distOf(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes
    val y = b.getBytes
    if (x.length == 0) return y.length
    if (y.length == 0) return x.length
    // DP over the shorter string's dimension to keep the rolling rows
    // small; distance is symmetric
    val (s, t) = if (x.length <= y.length) (x, y) else (y, x)
    val n = s.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= t.length) {
      cur(0) = i
      val tc = t(i - 1)
      var k = 1
      while (k <= n) {
        val cost = if (s(k - 1) == tc) 0 else 1
        val del = prev(k) + 1
        val ins = cur(k - 1) + 1
        val sub = prev(k - 1) + cost
        cur(k) = math.min(math.min(del, ins), sub)
        k += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(n)
  }

  def levBytes(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      LevenshteinBytes(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
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

/** Tokens whose 0-based index lies OUTSIDE every [s, e] interval of
  * `bounds` — a flattened array of SORTED DISJOINT pairs
  * [s₁,e₁,s₂,e₂,…] (the shape `Dedup.stripDupSpans` aggregates from
  * its duplicated-span islands). One O(|tokens| + |bounds|) merge walk
  * per row in whole-stage codegen; the `filter(exists(...))` HOF
  * formulation would run |tokens|·|intervals| interpreted lambda calls
  * on the corpus hot path (CLAUDE.md rule). A null/absent bounds array
  * keeps every token (the no-duplicates case after the left join). */
case class TokensOutsideIntervals(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
  override def prettyName: String = "tokens_outside_intervals"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(StringType, _),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tokens_outside_intervals expects (array<string>, array<bigint>), got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  def filterOf(toks: org.apache.spark.sql.catalyst.util.ArrayData,
               bounds: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = toks.numElements()
    val nb = bounds.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var j = 0
    var i = 0L
    while (i < n) {
      while (j + 1 < nb && bounds.getLong(j + 1) < i) j += 2
      val inside = j + 1 < nb && bounds.getLong(j) <= i && i <= bounds.getLong(j + 1)
      if (!inside)
        out.add(if (toks.isNullAt(i.toInt)) null else toks.getUTF8String(i.toInt))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[UTF8String](out.size)))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    filterOf(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("toksOutside", this,
      classOf[TokensOutsideIntervals].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.filterOf($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokensOutsideIntervals {
  def tokensOutside(toks: Column, bounds: Column): Column =
    GraftSqlBridge.column(TokensOutsideIntervals(
      GraftSqlBridge.expression(toks), GraftSqlBridge.expression(bounds)))
}
