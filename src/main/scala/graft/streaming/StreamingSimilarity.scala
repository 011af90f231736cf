package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LIVE embedding near-duplicate gate — the vector twin of
  * [[StreamingDedup.flagNearDups]], completing the ingest story: text
  * arrivals are checked against the persisted LSH index, embedding
  * arrivals against the persisted IVF index (SemDeDup at accept time
  * — Abbas et al. 2023's semantic dedup run as an ingest filter
  * instead of a corpus-wide batch).
  *
  * Per micro-batch, each arriving vector is assigned its `nProbe`
  * nearest sidecar centroids (the index's own immutable quantizer —
  * one per-row codegen argmax, no state), then stream-static-joined
  * against the index on `cent_id` and cosine-verified. Append-mode
  * safe: no state, no watermark.
  *
  * Scale shape: the static side is the partitioned index; Spark's
  * stream-static join re-plans it per micro-batch, so partition
  * pruning on `cent_id` applies per batch where the planner can prove
  * it, and the join never shuffles the stream (the index side is the
  * build side). The candidate volume per arrival is its probed
  * clusters' rows — the IVF recall/cost dial — never the corpus.
  * Recall caveat (inherent to IVF, same as the batch path): a true
  * near-dup assigned to a cluster OUTSIDE the probe set is missed;
  * `nProbe` tunes that, spec'd against the batch oracle. */
object StreamingSimilarity {

  /** Emits (id, neighbor_id, cos_sim) for every (arriving vector,
    * indexed vector) pair with cosine ≥ `threshold` among the probed
    * clusters. `tombstones` (deleted vector ids, one `idCol` column)
    * anti-join the static side — retracted vectors stop matching
    * without an index rebuild. Growing-set caveat (same as
    * [[StreamingDedup.flagNearDups]]): a path-based parquet frame's
    * file listing is cached at creation, so mid-stream appends need a
    * catalog table + `spark.catalog.refreshTable` to be honored by
    * the next micro-batch. */
  def flagNearVectors(stream: DataFrame, indexDir: String, idCol: String,
                      vecCol: String, threshold: Double, nProbe: Int,
                      tombstones: Option[DataFrame] = None): DataFrame = {
    val spark = stream.sparkSession
    // ONE generation resolve for both the data frame and the quantizer
    // (a commit racing the gate start must not mix generations)
    val gen = Similarity.resolveIvfGen(spark, indexDir)
    flagNearVectors(stream, spark.read.parquet(gen),
      Similarity.readCentroidsAt(spark, gen), idCol, vecCol,
      threshold, nProbe, tombstones)
  }

  /** Static-side-as-DataFrame form — the GROWING-index shape: register
    * an external catalog table over the index dir (partitioned on
    * `cent_id`), pass `spark.table(...)` here, and after each
    * [[graft.operators.Similarity.appendToIvfIndex]] generation call
    * `recoverPartitions` + `refreshTable`; the next micro-batch then
    * sees the appended vectors without a query restart (the path-based
    * overload's cached file listing cannot). The quantizer matrix is
    * passed explicitly because it is immutable across generations —
    * read it once from the sidecar. */
  def flagNearVectors(stream: DataFrame, index: DataFrame,
                      matrix: Array[Array[Double]], idCol: String,
                      vecCol: String, threshold: Double, nProbe: Int,
                      tombstones: Option[DataFrame]): DataFrame = {
    import graft.expressions.VectorExpressions.{nearestCentroids, vecDot, vecNorm}
    val probed = stream.select(col(idCol), col(vecCol).as("qv"))
      .withColumn("qn", vecNorm(col("qv")))
      .withColumn("cent_id", explode(nearestCentroids(col("qv"), matrix, nProbe)))
    val idx = tombstones.foldLeft(index)((i, t) =>
      i.join(broadcast(t.select(col(idCol).as("neighbor_id"))),
        Seq("neighbor_id"), "left_anti"))
    probed.join(idx, Seq("cent_id"))
      .where(col(idCol) =!= col("neighbor_id"))
      .withColumn("cos_sim",
        vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .where(col("cos_sim") >= threshold)
      .select(col(idCol), col("neighbor_id"), col("cos_sim"))
  }
}
