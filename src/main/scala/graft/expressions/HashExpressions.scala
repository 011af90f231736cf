package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Full MinHash signature of a shingle set in ONE expression node.
  *
  * For each shingle: md5 → h1 = first 48 bits, h2 = next 48 bits
  * (both as non-negative longs); hash_i = h1 + i·h2
  * (Kirsch–Mitzenmacher double hashing). sig[i] = min over shingles.
  *
  * Two properties drive the design:
  *  - ONE pass: the whole `numHashes`-wide signature is computed per row
  *    from the shingle array — no explode, no 64-column aggregate, no
  *    shuffle (the round-1 formulation spent 18% of the bench here);
  *  - engine-portable: md5 is bit-identical everywhere and
  *    h1 + i·h2 ≤ 2^48·(1+numHashes) fits a 64-bit BIGINT without
  *    overflow, so a SQL oracle (DuckDB) using 64-bit integer math
  *    reproduces the signature bit-for-bit by parsing the md5 hex.
  *    (NOT exactly representable in DOUBLE once numHashes > 31 — the
  *    max exceeds 2^53 — so a double-arithmetic oracle port would
  *    silently diverge; the oracle must stay integer.)
  *
  * Empty shingle arrays yield a signature of Long.MaxValue sentinels —
  * callers filter size(shingles) > 0 upstream.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${other.simpleString}")
    }

  private def read48(dig: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 6) {
      v = (v << 8) | (dig(off + i) & 0xFFL)
      i += 1
    }
    v
  }

  def signatureOf(arr: ArrayData): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      val dig = md.digest(arr.getUTF8String(s).getBytes)
      md.reset()
      val h1 = read48(dig, 0)
      val h2 = read48(dig, 6)
      var i = 0
      while (i < numHashes) {
        val h = h1 + i.toLong * h2
        if (h < out(i)) out(i) = h
        i += 1
      }
      s += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(signatureOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.signatureOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two equal-length `array<long>` signatures
  * agree — the MinHash estimated-Jaccard numerator.
  *
  * The `zip_with`/`filter` HOF form of this is interpreted (no
  * whole-stage codegen) and allocates an intermediate boolean array per
  * candidate pair; at 100 TB candidate-pair counts that per-pair verify
  * IS the hot loop. This compiles to a tight primitive loop inside the
  * WholeStageCodegen span (same pattern as `VectorDot`).
  *
  * Signatures of UNEQUAL length are an error (silently comparing the
  * common prefix would return a wrong Jaccard numerator); a NULL element
  * at a position never agrees (SQL semantics: NULL = NULL is not true —
  * the SQL-exposed form accepts any array<bigint>, nullable included).
  */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "signature_agreement"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"signature_agreement expects two array<bigint> args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  def agreementOf(x: ArrayData, y: ArrayData): Int = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"signature_agreement: signature lengths differ ($n vs ${y.numElements()})")
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    agreementOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sigAgree", this, classOf[SignatureAgreement].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $self.agreementOf($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature straight from the TOKEN array: word n-grams are
  * built in a reused buffer, md5-hashed and Kirsch–Mitzenmacher-mixed
  * into the running minima in ONE fused pass — no shingle-string array
  * is ever materialized (the `transform`/`concat_ws` pipeline that
  * built it ran interpreted and was the dominant cold-run cost of the
  * MinHash query). Bit-identical to `MinHashSignature` over the
  * distinct shingle set: min() over a multiset equals min() over its
  * set, so skipping the dedup changes nothing.
  * Callers filter docs with fewer than n tokens (as with
  * `MinHashSignature`'s empty-array sentinel).
  */
case class MinHashTokens(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n >= 1 && numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_tokens"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_tokens expects array<string>, got ${other.simpleString}")
    }

  private def read48(dig: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (dig(off + i) & 0xFFL); i += 1 }
    v
  }

  def signatureOf(arr: ArrayData): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val m = arr.numElements() - n + 1
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      md.reset()
      val h1 = read48(dig, 0)
      val h2 = read48(dig, 6)
      var k = 0
      while (k < numHashes) {
        val h = h1 + k.toLong * h2
        if (h < out(k)) out(k) = h
        k += 1
      }
      i += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(signatureOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashToks", this, classOf[MinHashTokens].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.signatureOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DISTINCT 64-bit hashes of a token array's word n-grams in ONE
  * expression node — the inverted-index posting generator for n-gram
  * Jaccard dedup.
  *
  * Replaces the interpreted pipeline `transform(sequence, i →
  * concat_ws(element_at…)) → array_distinct → explode → xxhash64`:
  * higher-order functions run outside whole-stage codegen and
  * materialize every gram STRING per row; this builds each gram once in
  * a reused buffer, hashes it (xxHash64, Spark's own kernel), and
  * dedupes by hash. The hash is engine-INTERNAL (the SQL oracle joins
  * on raw gram strings), so only self-consistency matters; a within-doc
  * hash collision merging two grams has the same ~2⁻⁶⁴-scale odds as
  * the documented cross-doc case.
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_hashes expects array<string>, got ${other.simpleString}")
    }

  def hashesOf(arr: ArrayData): Array[Long] = {
    val m = arr.numElements() - n + 1
    if (m <= 0) return Array.empty
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      val bytes = sb.toString.getBytes("UTF-8")
      set.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L))
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(hashesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gramHashes", this, classOf[GramHashes].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.hashesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken '03,
  * public algorithm) in ONE expression node: token k-gram hashes →
  * sliding windows of `w` hashes → the MINIMUM hash of each window is
  * selected → the DISTINCT selected values, ascending.
  *
  * Winnowing's guarantee: any shared token run of length ≥ w+k-1
  * between two documents yields at least one shared fingerprint, while
  * only ~2/(w+1) of the grams are kept — constant-factor compression
  * with a locality guarantee, the standard near-dup/plagiarism
  * fingerprint. (Emitting the value set rather than (pos, hash) pairs
  * makes the min-tiebreak rule irrelevant, which keeps a SQL oracle
  * trivial.)
  *
  * One pass, O(m) via a monotonic deque — no explode, no shuffle; the
  * k-gram hash is the first 48 bits of md5 (engine-portable, same
  * trick as `MinHashSignature`). Documents with fewer than w grams
  * fingerprint their single truncated window (short docs still hash).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints expects array<string>, got ${other.simpleString}")
    }

  private def read48(dig: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (dig(off + i) & 0xFFL); i += 1 }
    v
  }

  def fingerprintsOf(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    if (n < k) return Array.empty
    val m = n - k + 1
    val md = MessageDigest.getInstance("MD5")
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      md.reset()
      h(i) = read48(dig, 0)
      i += 1
    }
    // sliding-window min, O(m): deque holds indices with increasing h
    val sel = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Integer]()
    var p = 0
    while (p < m) {
      while (!deque.isEmpty && h(deque.peekLast()) >= h(p)) deque.pollLast()
      deque.addLast(p)
      if (deque.peekFirst() <= p - w) deque.pollFirst()
      // window ending at p starts at p-w+1; first full (or only) window
      // completes at p = min(w, m) - 1
      if (p >= math.min(w, m) - 1) sel.add(h(deque.peekFirst()))
      p += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(fingerprintsOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.fingerprintsOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DISTINCT 48-bit md5-derived hashes of a token array's word n-grams,
  * ascending — [[GramHashes]]'s engine-PORTABLE sibling. Where
  * `GramHashes` uses xxHash64 (engine-internal: its values never leave
  * a join), these values are OUTPUTS (e.g. the KMV distinct sketch's
  * order statistics enter the published estimate), so they must be
  * reproducible by a SQL oracle: hash = the first 6 md5 bytes, exactly
  * the `parse12(md5hex)` integer every other oracle here uses. Same
  * one-fused-pass shape: gram built once in a reused buffer, hashed,
  * deduped by TreeSet — no gram-string array, no interpreted HOFs. */
case class Md5GramHashes48(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_gram_hashes48"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_gram_hashes48 expects array<string>, got ${other.simpleString}")
    }

  def hashesOf(arr: ArrayData): Array[Long] = {
    val m = arr.numElements() - n + 1
    if (m <= 0) return Array.empty
    val set = new java.util.TreeSet[java.lang.Long]()
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      md.reset()
      var v = 0L
      var b = 0
      while (b < 6) { v = (v << 8) | (dig(b) & 0xFFL); b += 1 }
      set.add(v)
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(hashesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5GramHashes", this, classOf[Md5GramHashes48].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.hashesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed-feature linear model score: Σ over tokens of
  * w(token), where w = ((first32(md5(token)) mod `vocab`) mod
  * `weightMod`) − `weightMod`/2 — the fasttext-style
  * hash-into-buckets trick with a DETERMINISTIC pseudo-weight table
  * (the weight is a pure function of the bucket, so no trained-model
  * artifact ships with the query and a SQL oracle reproduces the
  * score exactly).
  *
  * The sum is kept in INTEGER weight units (±weightMod/2 per token;
  * 2^31 tokens × 500 fits a long with 2^20 headroom) so it is exact
  * and order-independent — the caller divides by (n · weightMod/2)
  * to get the [-1, 1] logit and rounds there (metric-double rule).
  * One fused scan pass per row: no explode, no interpreted HOF, no
  * shuffle — at 100 TB this is a pure map riding the parquet scan.
  *
  * first32(md5) is the SAME integer `Sampling.md5Bucket` parses
  * (`conv(substring(md5hex,1,8),16,10)`), so the oracle reuses the
  * q44 hex-parse idiom per token.
  */
case class HashedWeightSum(child: Expression, vocab: Int, weightMod: Int)
  extends UnaryExpression {
  require(vocab >= 1 && weightMod >= 1)

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_weight_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_weight_sum expects array<string>, got ${other.simpleString}")
    }

  def sumOf(arr: ArrayData): Long = {
    val m = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val half = weightMod / 2
    var sum = 0L
    var i = 0
    while (i < m) {
      val dig = md.digest(arr.getUTF8String(i).toString.getBytes("UTF-8"))
      md.reset()
      // first 4 digest bytes as the unsigned 32-bit int the hex parse yields
      val v32 = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      sum += (v32 % vocab) % weightMod - half
      i += 1
    }
    sum
  }

  override protected def nullSafeEval(input: Any): Any =
    sumOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedWeightSum", this, classOf[HashedWeightSum].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.sumOf($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Md5-48 hash of the SLIDING `n`-token gram starting at EVERY
  * position, document order, duplicates preserved — one hash per
  * start 0..len−n. Where [[Md5GramHashes48]] dedups to a set (for
  * similarity), the POSITIONS are the whole point here: a duplicated
  * substring of length L ≥ n covers exactly the L−n+1 consecutive
  * start positions whose grams repeat corpus-wide, so interval math
  * over covered starts recovers exact duplicated-substring statistics
  * (the Lee et al. 2022 ExactSubstr measures) without a suffix array.
  * Same fused-pass shape as the sibling kernels: gram built once in a
  * reused buffer, hashed, emitted in order — no gram-string array, no
  * interpreted HOFs; oracle-reproducible (parse12 of the md5 hex). */
case class PositionalGramHashes48(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_gram_hashes48"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"positional_gram_hashes48 expects array<string>, got ${other.simpleString}")
    }

  def hashesOf(arr: ArrayData): Array[Long] = {
    val m = arr.numElements() - n + 1
    if (m <= 0) return Array.empty
    val out = new Array[Long](m)
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i + j).toString)
        j += 1
      }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      md.reset()
      var v = 0L
      var b = 0
      while (b < 6) { v = (v << 8) | (dig(b) & 0xFFL); b += 1 }
      out(i) = v
      i += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(hashesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("posGramHashes", this,
      classOf[PositionalGramHashes48].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.hashesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Md5-48 hashes of a token array's NON-OVERLAPPING `k`-token blocks
  * (trailing partial block dropped), duplicates PRESERVED — the unit
  * of the fixed-block duplicate-text measure (Gopher-style "fraction
  * of text in duplicated passages", at block rather than n-gram
  * granularity). Where [[Md5GramHashes48]] dedups overlapping grams
  * for set similarity, here each block is one countable unit of
  * document text: a block repeated across (or within) documents must
  * be counted each time it occurs.
  *
  * Same fused-pass shape as the gram kernels: block string built once
  * in a reused buffer, hashed, emitted — no gram-string array, no
  * interpreted HOFs; the values feed an engine-internal count-join
  * but stay oracle-reproducible (parse12 of the md5 hex) so a spec
  * can check them directly.
  */
case class ChunkHashes48(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chunk_hashes48"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"chunk_hashes48 expects array<string>, got ${other.simpleString}")
    }

  def hashesOf(arr: ArrayData): Array[Long] = {
    val m = arr.numElements() / k
    if (m <= 0) return Array.empty
    val out = new Array[Long](m)
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(arr.getUTF8String(c * k + j).toString)
        j += 1
      }
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      md.reset()
      var v = 0L
      var b = 0
      while (b < 6) { v = (v << 8) | (dig(b) & 0xFFL); b += 1 }
      out(c) = v
      c += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(hashesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("chunkHashes48", this, classOf[ChunkHashes48].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.hashesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial hash of EVERY `m`-element window of a bigint
  * array: out(j) = Σ_{i<m} arr(j+i)·B^{m−1−i} (wrapping 64-bit,
  * B = 0x100000001b3, the FNV-1a prime). One O(|arr|) pass per row —
  * the O(1)-per-window Rabin–Karp update, NOT an O(m)-per-window
  * slice hash — so a fully-duplicated 10⁶-token run costs 10⁶ ops,
  * not 10¹².
  *
  * `m` is a COLUMN (the ExactSubstr binary-search loop tests a
  * different window length per run per round). Out-of-range m (≤ 0 or
  * > |arr|) yields an empty array — the caller's "no window of that
  * length here" case, not an error.
  *
  * Values are engine-INTERNAL (q101's oracle re-derives the final
  * span lengths from the gram sequences themselves, never from these
  * hashes): equal windows always hash equal; unequal same-length
  * windows collide at the ~2⁻⁶⁴-birthday class over the same-length
  * window population — same documented risk family as the 48-bit gram
  * hashes, and a collision can only OVERSTATE a span by inventing a
  * duplicate. Inputs here are pseudo-random md5-48 grams, so the
  * known adversarial wrap-64 polynomial constructions don't arise. */
case class SlidingWindowHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_window_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sliding_window_hashes expects (array<bigint>, int), got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

  def windowHashesOf(arr: ArrayData, m: Int): ArrayData = {
    val n = arr.numElements()
    if (m <= 0 || m > n) return ArrayData.toArrayData(Array.empty[Long])
    val B = 0x100000001b3L
    val out = new Array[Long](n - m + 1)
    var bm1 = 1L
    var i = 1
    while (i < m) { bm1 *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < m) { h = h * B + arr.getLong(i); i += 1 }
    out(0) = h
    var j = 1
    while (j <= n - m) {
      h = (h - arr.getLong(j - 1) * bm1) * B + arr.getLong(j + m - 1)
      out(j) = h
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    windowHashesOf(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("slidingWin", this, classOf[SlidingWindowHashes].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $self.windowHashesOf($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** b-bit MinHash compression, b = 1 (Li & König 2010): pack the LOWEST
  * bit of each of the first ≤64 signature positions into one BIGINT
  * (bit i = sig[i] & 1). A 64-hash signature collapses from 512 bytes
  * to 8 — the per-pair verify becomes one XOR + popcount instead of a
  * 64-element array walk, and a billion-document signature table fits
  * where the full form would not. The estimator pays with variance,
  * not bias: for random hashes P[bit agree] = ½ + ½·J, so
  * Ĵ = 2·(agree/64) − 1, clamped at 0. Pure bit arithmetic on the
  * md5-derived minima, so a SQL oracle reproduces the agreement count
  * exactly (per-position `& 1` compare ≡ popcount of the packed XOR).
  */
case class PackLowBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pack_low_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_low_bits expects array<bigint>, got ${other.simpleString}")
    }

  def packOf(arr: ArrayData): Long = {
    val n = math.min(arr.numElements(), 64)
    var packed = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) packed |= (arr.getLong(i) & 1L) << i
      i += 1
    }
    packed
  }

  override protected def nullSafeEval(input: Any): Any =
    packOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("packLow", this, classOf[PackLowBits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.packOf($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Column API: array<long> MinHash signature of a shingle array. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSignature(
      GraftSqlBridge.expression(shingles), numHashes))

  /** Column API: number of agreeing positions of two signatures. */
  def signatureAgreement(a: Column, b: Column): Column =
    GraftSqlBridge.column(SignatureAgreement(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API: ascending distinct winnowing fingerprints of a token
    * array (k-gram size k, window w). */
  def winnowFingerprints(tokens: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(
      GraftSqlBridge.expression(tokens), k, w))

  /** Column API: ascending distinct xxHash64 values of a token array's
    * word n-grams. */
  def gramHashes(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(GramHashes(
      GraftSqlBridge.expression(tokens), n))

  /** Column API: fused tokens→n-gram→MinHash signature. */
  def minHashTokens(tokens: Column, n: Int, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashTokens(
      GraftSqlBridge.expression(tokens), n, numHashes))

  /** Column API: ascending distinct md5-48 hashes of a token array's
    * word n-grams (engine-portable values). */
  def md5GramHashes48(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(Md5GramHashes48(
      GraftSqlBridge.expression(tokens), n))

  /** Column API: exact integer-unit hashed-linear-model weight sum of
    * a token array (vocab buckets, weights in ±weightMod/2). */
  def hashedWeightSum(tokens: Column, vocab: Int, weightMod: Int): Column =
    GraftSqlBridge.column(HashedWeightSum(
      GraftSqlBridge.expression(tokens), vocab, weightMod))

  /** Column API: integral division (SQL `div` / DuckDB `//`) — the
    * Column DSL only exposes double `/`, which loses exactness above
    * 2^53. Callers keep both operands non-negative where cross-engine
    * agreement matters (floor vs truncate differ on negatives). */
  def intDiv(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API: b=1-bit MinHash — pack each signature position's low
    * bit into one bigint (bit i = sig[i] & 1). */
  def packLowBits(sig: Column): Column =
    GraftSqlBridge.column(PackLowBits(GraftSqlBridge.expression(sig)))

  /** Column API: md5-48 hashes of the non-overlapping k-token blocks,
    * duplicates preserved, document order. */
  def chunkHashes48(tokens: Column, k: Int): Column =
    GraftSqlBridge.column(ChunkHashes48(
      GraftSqlBridge.expression(tokens), k))

  /** Column API: md5-48 hash of the sliding n-gram at EVERY start
    * position, document order, duplicates preserved. */
  def positionalGramHashes48(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(PositionalGramHashes48(
      GraftSqlBridge.expression(tokens), n))

  /** Column API: rolling 64-bit polynomial hash of every m-element
    * window of a bigint array (m a column; O(1) per window). */
  def slidingWindowHashes(arr: Column, m: Column): Column =
    GraftSqlBridge.column(SlidingWindowHashes(
      GraftSqlBridge.expression(arr), GraftSqlBridge.expression(m)))
}
