package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * - `bruteForceKnn`: exact top-k by cosine — broadcast the (small) query
  *   set against the corpus; one pass, no shuffle of the corpus, per-query
  *   top-k via window. The baseline and the verifier for the ANN path.
  * - `lshKnn`: random-hyperplane LSH — each vector gets a `nBits`-bit
  *   signature (sign of dot with deterministic pseudorandom planes);
  *   candidates are corpus vectors sharing a signature bucket with the
  *   query (multi-probe over exact bucket + all 1-bit flips). At 100 TB
  *   the corpus is bucketed once (write-side) and each query touches
  *   only its probe buckets.
  *
  * All arithmetic is double, accumulated left-to-right over the array
  * (`aggregate`), so results are bit-reproducible and match an oracle
  * computing the same fold.
  */
object Similarity {

  /** Left-to-right double fold of elementwise product: dot(a, b). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k for each query vector. Queries must be small
    * enough to broadcast (they are, by construction of ANN workloads).
    * Ties broken by ascending corpus id for determinism.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic pseudorandom hyperplanes (fixed seed), as a literal
    * array<array<double>> column; `dim` x `nBits`. */
  private def planes(dim: Int, nBits: Int): Column = {
    val rnd = new scala.util.Random(42)
    array((0 until nBits).map { _ =>
      array((0 until dim).map(_ => lit(rnd.nextGaussian())): _*)
    }: _*)
  }

  /** Signature = integer whose bit i is sign(dot(v, plane_i)). */
  def lshSignature(vec: Column, dim: Int, nBits: Int): Column = {
    val ps = planes(dim, nBits)
    aggregate(
      zip_with(ps, sequence(lit(0), lit(nBits - 1)),
        (p, i) => when(dot(vec, p) >= 0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
  }

  /** ANN top-k: exact cosine ranking restricted to LSH candidates
    * (same bucket, or any bucket at Hamming distance 1 — multi-probe).
    * Recall < 1 by construction; `bruteForceKnn` is the oracle. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int, nBits: Int): DataFrame = {
    val c = corpus
      .withColumn("bucket", lshSignature(col(vecCol), dim, nBits))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"))
    val probes = (vec: Column) => {
      val sig = lshSignature(vec, dim, nBits)
      array_union(array(sig),
        transform(sequence(lit(0), lit(nBits - 1)),
          i => sig.bitwiseXOR(call_function("shiftleft", lit(1L), i.cast("int")))))
    }
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("probe", explode(probes(col("qv")))))
    val cand = c.join(q, col("bucket") === col("probe") &&
        col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
    val scored = cand.withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Embedding-cosine near-duplicate pairs ≥ threshold. Exact form is a
    * blocked self-join; the scale path replaces the condition join with
    * LSH buckets (see `lshKnn`). Kept exact here because it is the
    * oracle-checkable variant. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
