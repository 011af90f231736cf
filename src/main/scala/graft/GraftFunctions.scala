package graft

import graft.expressions.{CharEntropy, GramHashes, LshSignatures, Md5GramHashes48, MinHashSignature, MinHashTokens, NormalizeText, SignatureAgreement, VectorDot, WinnowFingerprints}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's custom Catalyst expressions, so the
  * functions are usable from `spark.sql(...)` exactly like built-ins
  * (the reference's users write SQL, not the DataFrame API).
  *
  * Two registration paths:
  *  - `GraftFunctions.register(spark)` — per-session, for an existing
  *    session (tests, notebooks);
  *  - `spark.sql.extensions=graft.GraftExtensions` — builder-time
  *    injection for cluster deployment.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, exprs: Seq[Expression], min: Int, max: Int): Unit =
    require(exprs.length >= min && exprs.length <= max,
      s"$name expects $min${if (max != min) s"..$max" else ""} arguments, " +
        s"got ${exprs.length}")

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> (exprs => {
      arity("vector_dot", exprs, 2, 2)
      VectorDot(exprs(0), exprs(1))
    }),
    "normalize_text" -> (exprs => {
      arity("normalize_text", exprs, 1, 1)
      NormalizeText(exprs.head)
    }),
    // lsh_signatures(vec, dim, nBits, numTables[, seed])
    "lsh_signatures" -> (exprs => {
      arity("lsh_signatures", exprs, 4, 5)
      LshSignatures(exprs(0),
        intLit(exprs(1), "dim").toInt, intLit(exprs(2), "nBits").toInt,
        intLit(exprs(3), "numTables").toInt,
        if (exprs.length > 4) intLit(exprs(4), "seed") else 42L)
    }),
    // minhash_signature(shingles, numHashes)
    "minhash_signature" -> (exprs => {
      arity("minhash_signature", exprs, 2, 2)
      MinHashSignature(exprs(0), intLit(exprs(1), "numHashes").toInt)
    }),
    // signature_agreement(sigA, sigB)
    "signature_agreement" -> (exprs => {
      arity("signature_agreement", exprs, 2, 2)
      SignatureAgreement(exprs(0), exprs(1))
    }),
    // winnow_fingerprints(tokens, k, w)
    "winnow_fingerprints" -> (exprs => {
      arity("winnow_fingerprints", exprs, 3, 3)
      WinnowFingerprints(exprs(0),
        intLit(exprs(1), "k").toInt, intLit(exprs(2), "w").toInt)
    }),
    // gram_hashes(tokens, n) — distinct 64-bit word-n-gram hashes
    "gram_hashes" -> (exprs => {
      arity("gram_hashes", exprs, 2, 2)
      GramHashes(exprs(0), intLit(exprs(1), "n").toInt)
    }),
    // minhash_tokens(tokens, n, numHashes) — fused tokens→grams→MinHash
    "minhash_tokens" -> (exprs => {
      arity("minhash_tokens", exprs, 3, 3)
      MinHashTokens(exprs(0),
        intLit(exprs(1), "n").toInt, intLit(exprs(2), "numHashes").toInt)
    }),
    // md5_gram_hashes48(tokens, n) — distinct PORTABLE md5-48 gram hashes
    "md5_gram_hashes48" -> (exprs => {
      arity("md5_gram_hashes48", exprs, 2, 2)
      Md5GramHashes48(exprs(0), intLit(exprs(1), "n").toInt)
    }),
    // char_entropy(text) — struct<n_chars, n_unique, entropy>
    "char_entropy" -> (exprs => {
      arity("char_entropy", exprs, 1, 1)
      CharEntropy(exprs.head)
    }))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Builder-time injection: `.config("spark.sql.extensions",
  * "graft.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
