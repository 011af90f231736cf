package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online near-duplicate gating: flag documents ARRIVING on a stream
  * whose MinHash-LSH buckets collide with a static corpus index — the
  * admission check a training-data ingest pipeline runs before letting
  * a crawled document into the corpus.
  *
  * Scale shape (the reason this is not just `minHashLshPairs` on a
  * union):
  *  - the corpus index is built ONCE (one batch pass, persistable to
  *    parquet bucketed by (band, bucket)) — the stream never rescans
  *    or reshuffles the corpus;
  *  - each micro-batch is stateless: per-row fused signature kernel
  *    (`MinHashTokens` — no shuffle), then ONE stream-static equi-join
  *    on (band, bucket) against the index;
  *  - per-pair exact verification reuses the codegen
  *    `SignatureAgreement` kernel against the index row's stored
  *    signature, so false bucket collisions are filtered before emit
  *    and the output needs no post-hoc dedup state: a pair either
  *    agrees on ≥ the threshold (emitted, possibly once per colliding
  *    band — downstream `dropDuplicates` is optional) or never appears.
  */
object StreamingDedup {

  /** Build the static side: (band, bucket, corpus_id, corpus_sig).
    * Persist/bucket this by (band, bucket) for the 100 TB deployment;
    * here it stays a DataFrame so the spec can exercise the join. */
  def bucketIndex(corpus: DataFrame, idCol: String, textCol: String,
                  shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    val sig = Dedup.minHashSignatures(corpus, idCol, textCol, shingleN, numHashes)
    Dedup.bandedBuckets(sig, idCol, numHashes, bands)
      .select(col("band"), col("bucket"), col(idCol).as("corpus_id"),
        col("sig").as("corpus_sig"))
  }

  /** Flag streaming docs against the index. Emits
    * (id, corpus_id, est_jaccard) for every (streamed doc, corpus doc)
    * pair whose signatures agree on ≥ `minJaccard`·numHashes positions;
    * append-mode safe (no state, no watermark needed).
    *
    * `tombstones` (deleted corpus ids, one `idCol` column) mirrors the
    * batch read path (`Dedup.lshPairsIndexed`): retracted corpus docs
    * stop matching. Growing-set contract (probe-verified, pinned in
    * StreamingSpec): the static side's PLAN re-executes per
    * micro-batch, but a path-based parquet frame caches its file
    * listing at creation — appends are INVISIBLE to a running query.
    * Pass a CATALOG table (`spark.table`) and call
    * `spark.catalog.refreshTable` after each tombstone append; the
    * next micro-batch then honors the new deletes without a restart.
    * Physical cleanup stays `Dedup.compactLshIndex`. */
  def flagNearDups(stream: DataFrame, index: DataFrame, idCol: String,
                   textCol: String, shingleN: Int, numHashes: Int,
                   bands: Int, minJaccard: Double,
                   tombstones: Option[DataFrame] = None): DataFrame = {
    val sig = Dedup.minHashSignatures(stream, idCol, textCol, shingleN, numHashes)
    val banded = Dedup.bandedBuckets(sig, idCol, numHashes, bands)
    val idx = tombstones.foldLeft(index)((i, t) =>
      i.join(org.apache.spark.sql.functions.broadcast(
        t.select(col(idCol).as("corpus_id"))), Seq("corpus_id"), "left_anti"))
    banded.join(idx, Seq("band", "bucket"))
      .where(col(idCol) =!= col("corpus_id"))
      .withColumn("est_jaccard",
        graft.expressions.HashExpressions
          .signatureAgreement(col("sig"), col("corpus_sig"))
          .cast("double") / numHashes)
      .where(col("est_jaccard") >= minJaccard)
      .select(col(idCol), col("corpus_id"), col("est_jaccard"))
  }
}
