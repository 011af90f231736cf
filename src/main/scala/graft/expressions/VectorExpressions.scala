package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Codegen'd dot product over `array<float>` / `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * interpreted (no whole-stage codegen) and allocate an intermediate
  * array per row — orders of magnitude too slow for pairwise similarity
  * over millions of candidate pairs. This expression compiles to a tight
  * primitive loop inside the WholeStageCodegen span.
  *
  * Accumulation is double-precision left-to-right (same fold order as
  * the interpreted form and the DuckDB oracle), so results stay
  * bit-compatible with the oracle's cosine.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector_dot expects array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_dot expects two array<float|double> args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared Euclidean distance of two vector columns as the DIRECT
  * left-to-right fold Σ (x_i − y_i)² — deliberately NOT the
  * dot-product expansion |x|² − 2x·y + |y|² ([[VectorDot]]-based),
  * which is a DIFFERENT sequence of float ops: a SQL oracle's
  * `list_sum(list_transform(..., (x−y)²))` is this fold, and the
  * exact-rerank ranking compares these doubles, so the op order must
  * match bit-for-bit (pre-round). Same mixed float/double handling
  * and codegen shape as [[VectorDot]]. */
case class VectorL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_l2sq"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector_l2sq expects array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_l2sq expects two array<float|double> args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // strict-dim contract (repo-wide vector rule): fail loudly
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vector_l2sq: dims ${n} != ${y.numElements()}")
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vector_l2sq: dims " + $n + " != " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.$lGet($i)) - ((double) $b.$rGet($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numTables` random-hyperplane LSH signatures of a vector in ONE
  * expression node: bit b of signature t = sign(dot(v, plane[t][b])).
  *
  * Planes are Rademacher (±1-component) hyperplanes — the classic
  * sign-random-projection family (Charikar '02) with ±1 instead of
  * Gaussian components, which preserves the cosine-collision property.
  * Two portability choices make the bucketing bit-exact across engines
  * (so a SQL oracle can reproduce it):
  *  - plane signs come from md5("plane|seed|t|b|d") (low bit of the
  *    digest), not a JVM RNG;
  *  - the dot runs over floor(v[d]·2^20) INTEGER quantizations, so the
  *    sum is order-independent (no float accumulation to replicate).
  *
  * The sign matrix is generated ONCE per plan (a reference object in
  * codegen) — embedding planes as literal arrays instead produces a
  * ~(tables·bits·dim)-node expression tree that blows past optimizer
  * and codegen budgets (measured 48 s of plan overhead at 8x8x64).
  * Returns array<long> of length `numTables`.
  *
  * Zero-length/all-missing vectors: acc = 0 sets EVERY bit (acc >= 0),
  * while a SQL oracle's sum() over no rows is NULL → bit 0 — a silent
  * engine/oracle divergence. Callers MUST filter empty vectors upstream
  * (`Similarity` does), mirroring the MinHash empty-shingle guard.
  */
case class LshSignatures(child: Expression, dim: Int, nBits: Int,
                         numTables: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_signatures"

  // signs(((t*nBits)+b)*dim + d) ∈ {-1, +1}
  @transient lazy val signs: Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](numTables * nBits * dim)
    var idx = 0
    var t = 0
    while (t < numTables) {
      var b = 0
      while (b < nBits) {
        var d = 0
        while (d < dim) {
          val dig = md.digest(s"plane|$seed|$t|$b|$d".getBytes("UTF-8"))
          out(idx) = if ((dig(15) & 1) == 1) 1 else -1
          idx += 1
          d += 1
        }
        b += 1
      }
      t += 1
    }
    out
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def signaturesOf(v: ArrayData): Array[Long] = {
    val isF = elemIsFloat
    val n = math.min(v.numElements(), dim)
    // quantize once per vector: float→double is exact and ·2^20 is a
    // power-of-two scale, so floor() is identical in any IEEE engine
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = math.floor(x * 1048576.0).toLong
      i += 1
    }
    val out = new Array[Long](numTables)
    val sg = signs
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var b = 0
      while (b < nBits) {
        val base = (t * nBits + b) * dim
        var acc = 0L
        var d = 0
        while (d < n) {
          acc += sg(base + d) * q(d)
          d += 1
        }
        if (acc >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      signaturesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshSigs", this, classOf[LshSignatures].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.signaturesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss sign (Rademacher) random projection of a
  * vector to `outDim` integer-quantized components in ONE node:
  * out[j] = Σ_d sign(j, d) · floor(v[d]·2^20) — the [[LshSignatures]]
  * portability contract (md5-derived ±1 components, integer
  * accumulation: order-independent, a SQL oracle replays it exactly),
  * but keeping the signed SUM rather than just its sign bit
  * (Achlioptas 2003: ±1 entries satisfy the JL lemma). The caller
  * divides by 2^20·√outDim to recover the distance-preserving scale;
  * the integer stays the comparison/oracle surface.
  *
  * Signs come from md5("jl|seed|j|d") low bit (+1 when set); the
  * outDim×dim sign matrix is a codegen reference object (never a
  * literal tree — the LshSignatures plan-blowup lesson). Empty/short
  * vectors accumulate only their present dims; callers filter empty
  * vectors upstream (the LSH empty-vector oracle caveat). */
case class SignedProjection(child: Expression, dim: Int, outDim: Int,
                            seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_projection"

  // signs(j*dim + d) ∈ {-1, +1}
  @transient lazy val signs: Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](outDim * dim)
    var idx = 0
    var j = 0
    while (j < outDim) {
      var d = 0
      while (d < dim) {
        val dig = md.digest(s"jl|$seed|$j|$d".getBytes("UTF-8"))
        out(idx) = if ((dig(15) & 1) == 1) 1 else -1
        idx += 1
        d += 1
      }
      j += 1
    }
    out
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def projectOf(v: ArrayData): Array[Long] = {
    val isF = elemIsFloat
    val n = math.min(v.numElements(), dim)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      q(i) = math.floor(x * 1048576.0).toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    val sg = signs
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var acc = 0L
      var d = 0
      while (d < n) {
        acc += sg(base + d) * q(d)
        d += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      projectOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signedProj", this,
      classOf[SignedProjection].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.projectOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` nearest centroids (by cosine) of a vector, as
  * array<int> of centroid indices — per-row argmax over a small
  * centroid matrix held as a codegen reference object. This is the
  * IVF assignment/probe kernel: NO join, NO shuffle, one corpus pass.
  *
  * Oracle-equivalence assumption (documented, accepted): the ranking
  * key here is dot/|centroid| (|v| omitted — constant per row, so the
  * argmax is mathematically identical to cosine), while a SQL oracle
  * ranks by full cosine via its own float code path. The orderings
  * agree unless two centroids tie within float ulps of each other for
  * some row — vanishingly unlikely for real embeddings, but a known
  * sensitivity at larger scale factors; a divergence would surface as
  * a hash-gate mismatch, not silent corruption.
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def probesOf(v: ArrayData): Array[Int] = {
    val isF = elemIsFloat
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val p = centroids(c)
      // strict-length contract (same as SignatureAgreement): a short or
      // corrupt embedding must fail loudly, not get a biased probe list
      val n = v.numElements()
      if (n != p.length)
        throw new IllegalArgumentException(
          s"nearest_centroids: vector dim $n != centroid dim ${p.length}")
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * p(i)
        i += 1
      }
      sims(c) = if (centroidNorms(c) > 0) acc / centroidNorms(c) else Double.MinValue
      c += 1
    }
    // top-nProbe indices by sim, index ascending on ties (deterministic)
    sims.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)
  }

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      probesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearCent", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.probesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared-L2 nearest-centroid assignment: returns
  * `struct<cluster int, l2sq double>` — the argmin centroid index and
  * the (unrounded) squared Euclidean distance to it. The k-means
  * assignment step as a single per-row codegen kernel: no join against
  * a centroid table, no shuffle of the corpus, the centroid matrix
  * rides along as a codegen reference object (never a literal tree —
  * CLAUDE.md rule).
  *
  * Distance is accumulated double-precision left-to-right over the
  * dimensions — the same fold order a SQL oracle's list-sum uses — and
  * ties break to the LOWEST centroid index (strict `<` keeps the first
  * minimum). Same documented ulp-tie sensitivity as
  * [[NearestCentroids]]: an exact tie between two centroids within one
  * ulp would surface as a hash-gate mismatch, not silent corruption.
  */
case class CentroidAssignL2(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("l2sq", DoubleType, nullable = false)))
  override def prettyName: String = "centroid_assign_l2"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def assignOf(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val isF = elemIsFloat
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val p = centroids(c)
      // strict-length contract (same as SignatureAgreement): a short or
      // corrupt embedding must fail loudly, not get a biased assignment
      // from a truncated distance
      val n = v.numElements()
      if (n != p.length)
        throw new IllegalArgumentException(
          s"centroid_assign_l2: vector dim $n != centroid dim ${p.length}")
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - p(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestD)
  }

  override protected def nullSafeEval(input: Any): Any =
    assignOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centAssign", this, classOf[CentroidAssignL2].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.assignOf($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder (Jégou et al. 2011): the vector is cut
  * into `m` subspaces of `subDim` dims; per subspace, the code is the
  * squared-L2-argmin index into that subspace's codebook (strict `<`,
  * so a tie keeps the LOWEST index — deterministic, and what a SQL
  * oracle's `ORDER BY dist, c` argmin reproduces). A 64-float vector
  * compresses to m small ints — the memory step that makes a 100 TB
  * ANN corpus RAM-resident.
  *
  * The codebook rides as a codegen reference object (never a literal
  * tree — CLAUDE.md rule); per-subspace distances accumulate
  * double-precision left-to-right, the same fold the oracle's
  * `list_sum(list_transform(...))` runs, so the argmin is
  * cross-engine exact (the q49 assignment contract). Strict-dim: a
  * ragged vector fails loudly (repo-wide vector contract). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def codesOf(v: ArrayData): Array[Int] = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${v.numElements()} != ${m}x$subDim")
    val isF = elemIsFloat
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val p = book(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (isF) v.getFloat(s * subDim + i).toDouble
                  else v.getDouble(s * subDim + i)
          val d = x - p(i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(codesOf(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  $self.codesOf($v));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side PQ lookup table: `lut[s][c]` = squared L2 between the
  * query's subspace-s slice and codebook centroid c — computed ONCE
  * per query row, so the ADC scan over the corpus is pure table
  * lookups ([[AdcDistance]]). Same fold order and strict-dim contract
  * as [[PqEncode]]. */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def lutOf(v: ArrayData): Array[Array[Double]] = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_lut: vector dim ${v.numElements()} != ${m}x$subDim")
    val isF = elemIsFloat
    val out = new Array[Array[Double]](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val p = book(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (isF) v.getFloat(s * subDim + i).toDouble
                  else v.getDouble(s * subDim + i)
          val d = x - p(i)
          acc += d * d
          i += 1
        }
        row(c) = acc
        c += 1
      }
      out(s) = row
      s += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(lutOf(input.asInstanceOf[ArrayData])
      .map(r => ArrayData.toArrayData(r)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    val arrCls = "org.apache.spark.sql.catalyst.util.ArrayData"
    // freshName, not fixed identifiers: two PqLut nodes in one codegen
    // stage would otherwise collide and kick the stage to interpreted
    val rowsV = ctx.freshName("lutRows")
    val arrV = ctx.freshName("lutArr")
    val iV = ctx.freshName("li")
    nullSafeCodeGen(ctx, ev, v =>
      s"""double[][] $rowsV = $self.lutOf($v);
         |$arrCls[] $arrV = new $arrCls[$rowsV.length];
         |for (int $iV = 0; $iV < $rowsV.length; $iV++) {
         |  $arrV[$iV] = $arrCls.toArrayData($rowsV[$iV]);
         |}
         |${ev.value} = $arrCls.toArrayData($arrV);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance computation: Σ_s lut[s][codes[s]] — the PQ
  * approximate squared L2 between a query (via its [[PqLut]] table)
  * and a compressed corpus vector (its [[PqEncode]] codes). The hot
  * ADC loop is m array lookups + adds per candidate, fixed s=0..m−1
  * order (the emitted value is rounded 6 dp by the caller — the Σ is
  * m doubles, so engine-order ulp noise sits far below the round). */
case class AdcDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_distance"

  def distOf(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (lut.numElements() != m)
      throw new IllegalArgumentException(
        s"adc_distance: ${lut.numElements()} lut rows != $m codes")
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    distOf(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("adcDist", this, classOf[AdcDistance].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.distOf($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** PCA-residual energy: ‖x − μ‖² − Σ_c ((x − μ)·v_c)² — the variance
  * of a vector OUTSIDE the span of the supplied principal components.
  * The full-covariance upgrade of per-dim z-score outliering: a vector
  * that is large along the corpus's dominant directions is normal; one
  * with mass the top components cannot explain is anomalous.
  *
  * One per-row codegen kernel; μ and the component matrix ride along
  * as a codegen reference object (never a literal tree — CLAUDE.md
  * rule). Fold order is fixed and oracle-mirrored: d_i accumulated
  * ascending for both the energy and each projection, projections
  * subtracted in component order. Strict-length contract as
  * [[NearestCentroids]]: a wrong-dim vector fails loudly.
  */
case class ResidualEnergy(child: Expression, mu: Array[Double],
                          comps: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "residual_energy"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def residualOf(v: ArrayData): Double = {
    val isF = elemIsFloat
    val n = v.numElements()
    if (n != mu.length)
      throw new IllegalArgumentException(
        s"residual_energy: vector dim $n != mean dim ${mu.length}")
    val d = new Array[Double](n)
    var i = 0
    var e2 = 0.0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      d(i) = x - mu(i)
      e2 += d(i) * d(i)
      i += 1
    }
    var c = 0
    var r = e2
    while (c < comps.length) {
      val vc = comps(c)
      var p = 0.0
      i = 0
      while (i < n) { p += vc(i) * d(i); i += 1 }
      r -= p * p
      c += 1
    }
    r
  }

  override protected def nullSafeEval(input: Any): Any =
    residualOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("residEnergy", this, classOf[ResidualEnergy].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.residualOf($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API: codegen'd dot product. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }

  /** array<long> of `numTables` LSH signatures for the vector column. */
  def lshSignatures(v: Column, dim: Int, nBits: Int, numTables: Int,
                    seed: Long = 42L): Column =
    GraftSqlBridge.column(LshSignatures(
      GraftSqlBridge.expression(v), dim, nBits, numTables, seed))

  /** array<int> of the `nProbe` nearest centroid indices for the vector. */
  def nearestCentroids(v: Column, centroids: Array[Array[Double]],
                       nProbe: Int): Column =
    GraftSqlBridge.column(NearestCentroids(
      GraftSqlBridge.expression(v), centroids, nProbe))

  /** struct<cluster int, l2sq double>: squared-L2 argmin assignment. */
  def centroidAssignL2(v: Column, centroids: Array[Array[Double]]): Column =
    GraftSqlBridge.column(CentroidAssignL2(
      GraftSqlBridge.expression(v), centroids))

  /** array<int> PQ codes (one argmin index per subspace). */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(v), codebooks))

  /** array<array<double>> per-query PQ lookup table (m × ks sub-L2s). */
  def pqLut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqLut(GraftSqlBridge.expression(v), codebooks))

  /** double: Σ_s lut[s][codes[s]] asymmetric PQ distance. */
  def adcDistance(codes: Column, lut: Column): Column =
    GraftSqlBridge.column(AdcDistance(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(lut)))

  /** double: direct-fold squared L2 distance (oracle op order). */
  def vecL2Sq(a: Column, b: Column): Column =
    GraftSqlBridge.column(VectorL2Sq(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** array<long> of `outDim` integer-quantized JL sign projections. */
  def signedProjection(v: Column, dim: Int, outDim: Int, seed: Long): Column =
    GraftSqlBridge.column(SignedProjection(
      GraftSqlBridge.expression(v), dim, outDim, seed))

  /** double: ‖x−μ‖² minus the energy captured by the given principal
    * components. */
  def residualEnergy(v: Column, mu: Array[Double],
                     comps: Array[Array[Double]]): Column =
    GraftSqlBridge.column(ResidualEnergy(
      GraftSqlBridge.expression(v), mu, comps))
}
