package graft.operators

import graft.expressions.VectorExpressions.{vecDot, vecNorm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * - `bruteForceKnn`: exact top-k by cosine — broadcast the (small) query
  *   set against the corpus; one pass over the corpus, no corpus shuffle,
  *   per-query top-k via window. The baseline and the verifier for the
  *   ANN path.
  * - `lshKnn`: random-hyperplane LSH — each vector gets a `nBits`-bit
  *   signature (sign of dot with deterministic pseudorandom planes);
  *   candidates are corpus vectors sharing a signature bucket with the
  *   query (multi-probe: exact bucket + all 1-bit flips). At 100 TB the
  *   corpus is bucketed once (write-side) and each query touches only
  *   its probe buckets instead of the full corpus.
  *
  * Vector norms are computed ONCE per row before any pairing; per-pair
  * work is a single codegen'd `VectorDot` (see
  * `graft.expressions.VectorDot` — Spark's higher-order functions are
  * interpreted and allocate per row, far too slow for millions of pairs).
  * Dot accumulation is double left-to-right, matching the DuckDB oracle.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = vecNorm(a)

  def cosine(a: Column, b: Column): Column = vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Exact cosine score + per-query top-k over candidate rows carrying
    * (query_id, qv, qn, neighbor_id, cv, cn) — the shared tail of every
    * knn variant, so tiebreak/rounding fixes happen in ONE place. */
  private def topKByCosine(cand: DataFrame, k: Int,
                           carry: Seq[String] = Nil): DataFrame = {
    val scored = cand.withColumn("sim",
      vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select((Seq("query_id", "rank", "neighbor_id") ++ carry :+ "sim")
        .map(col): _*)
  }

  /** Exact cosine top-k for each query vector. Queries must be small
    * enough to broadcast (they are, by construction of ANN workloads).
    * Ties broken by ascending corpus id for determinism.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", vecNorm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", vecNorm(col("cv")))
    topKByCosine(c.join(q, col("query_id") =!= col("neighbor_id")), k)
  }

  /** Signature = long whose bit i is sign(dot(v, plane_i)); one table. */
  def lshSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    element_at(graft.expressions.VectorExpressions
      .lshSignatures(vec, dim, nBits, numTables = 1, seed), 1)

  /** ANN top-k: exact cosine ranking restricted to LSH candidates.
    *
    * Multi-table random-hyperplane LSH: `numTables` independent
    * signature tables of `nBits` bits; a corpus vector is a candidate
    * if it shares a bucket with the query in ANY table, where the query
    * probes its exact bucket plus every 1-bit flip (multi-probe). For
    * top-k neighbors at cosine ~0.5, 8 tables x 8 bits + 1-bit probing
    * gives ~0.9 recall while touching a small corpus fraction.
    *
    * Scale shape: the corpus is exploded to `numTables` bucket rows —
    * at 100 TB this is the (write-once) LSH index; queries broadcast.
    * Recall < 1 by construction; `bruteForceKnn` is the oracle.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, dim: Int, nBits: Int = 8,
             numTables: Int = 8): DataFrame = {
    import graft.expressions.VectorExpressions.lshSignatures
    // empty vectors would sign-collide into all-ones signatures while a
    // SQL oracle's sum(NULL) gives all-zero — exclude them up front
    // (they can't rank by cosine anyway: zero norm)
    val c = corpus.where(size(col(vecCol)) > 0)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", vecNorm(col("cv")))
      .select(col("neighbor_id"), col("cv"), col("cn"),
        posexplode(lshSignatures(col("cv"), dim, nBits, numTables)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "sig")
    // per table: probe the exact bucket plus every 1-bit flip
    val probeStructs = posexplode(lshSignatures(col("qv"), dim, nBits, numTables))
    val q = broadcast(queries.where(size(col(vecCol)) > 0)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", vecNorm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"), probeStructs)
      .withColumnRenamed("pos", "t")
      .withColumn("sig", explode(array_union(array(col("col")),
        transform(sequence(lit(0), lit(nBits - 1)),
          i => col("col").bitwiseXOR(call_function("shiftleft", lit(1L), i.cast("int")))))))
      .drop("col"))
    val cand = c.join(q, Seq("t", "sig"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn").distinct()
    topKByCosine(cand, k)
  }

  /** IVF (inverted-file) ANN top-k: the cluster-based scale path.
    *
    *  1. centroids = a deterministic content-keyed sample of the corpus
    *     (bottom-`nCentroids` by id hash — reproducible, no k-means
    *     iterations needed for a coarse quantizer);
    *  2. index build: every corpus vector is assigned to its nearest
    *     centroid (one corpus pass × nCentroids dots — the write-side
    *     cost; at 100 TB the assignment is persisted partitioned by
    *     cluster);
    *  3. query: probe the `nProbe` nearest clusters, exact-rerank only
    *     their members.
    *
    * Recall < 1 by construction; `bruteForceKnn` is the oracle
    * (asserted in SimilaritySpec). */
  /** Index-build-time centroid sample: deterministic bottom-k by id
    * hash, collected to the driver (nCentroids is small by design) and
    * embedded as a codegen reference object. The ordering key is the
    * md5 hex STRING of the id — lexicographic order of lowercase hex is
    * identical in every engine, so a SQL oracle selects the exact same
    * centroid sample. */
  private def sampledCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                               nCentroids: Int): Array[Array[Double]] =
    corpus
      .select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nCentroids)
      .collect()
      .map(_.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(s"bad element: $other")
      }.toArray)

  def ivfKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    import graft.expressions.VectorExpressions.nearestCentroids
    // the assignment below is a PER-ROW argmax over the sampled
    // centroids: no join, no shuffle of the corpus
    val matrix = sampledCentroids(corpus, idCol, vecCol, nCentroids)
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", vecNorm(col("cv")))
      .withColumn("cent_id", element_at(nearestCentroids(col("cv"), matrix, 1), 1))
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("qn", vecNorm(col("qv")))
        .withColumn("cent_id", explode(nearestCentroids(col("qv"), matrix, nProbe))))
    val cand = assigned.join(probes, Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
    topKByCosine(cand, k)
  }

  /** PERSISTED IVF index — the write-once 100 TB shape: corpus vectors
    * are assigned to their nearest centroid (one pass, per-row codegen
    * argmax) and written PARTITIONED BY cluster id; the centroid matrix
    * rides along as a tiny sidecar. Queries then touch only their
    * probed clusters' files via static partition pruning
    * (`ivfKnnIndexed`) — the corpus is never rescanned or reshuffled
    * per query batch.
    *
    * CRASH CONSISTENCY (VERDICT r12 item 3): an index root holds
    * GENERATIONS — `gen-0`, `gen-1`, … subdirectories; readers resolve
    * the highest-numbered one. Every full write (build / compact /
    * retrain) lands in a hidden `.gen-tmp-*` dir (invisible to
    * listings) and is committed by ONE atomic rename to `gen-<n>` —
    * a writer killed at ANY point leaves either invisible staging or a
    * fully-formed new generation, and the previous generation keeps
    * serving throughout. This also makes the IN-PLACE forms of
    * [[compactIvfIndex]]/[[retrainIvfIndex]] safe (fromDir == toDir),
    * the manifest-pointer swap the lifecycle ops previously required
    * two roots to approximate. Committed writes GC all but the two
    * newest generations (the grace generation covers readers pinned to
    * the previous one mid-query). A legacy non-generational root
    * (parquet directly under `dir`) keeps reading until its first
    * generational write. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    dir: String, nCentroids: Int): Unit = {
    import graft.expressions.VectorExpressions.nearestCentroids
    val spark = corpus.sparkSession
    val matrix = sampledCentroids(corpus, idCol, vecCol, nCentroids)
    val json = matrix.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeIvfGeneration(spark, dir) { tmp =>
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .withColumn("cn", vecNorm(col("cv")))
        .withColumn("cent_id", element_at(nearestCentroids(col("cv"), matrix, 1), 1))
        .write.mode("overwrite").partitionBy("cent_id").parquet(tmp)
      graft.sources.Fs.writeUtf8(spark, s"$tmp/_centroids.json", json)
    }
  }

  /** Resolve an index root to its CURRENT generation directory: the
    * highest `gen-<n>`, or the root itself for a legacy flat layout. */
  private[graft] def resolveIvfGen(spark: org.apache.spark.sql.SparkSession,
                                   dir: String): String = {
    val (fs, p) = graft.sources.Fs.on(spark, dir)
    if (!fs.exists(p)) return dir
    val gens = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.matches("gen-\\d+"))
    if (gens.isEmpty) dir
    else s"$dir/gen-${gens.map(_.stripPrefix("gen-").toLong).max}"
  }

  /** The current generation's rows (neighbor_id, cv, cn, cent_id) —
    * the read surface for occupancy/freshness cards and any consumer
    * that scans the index directly. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame =
    spark.read.parquet(resolveIvfGen(spark, dir))

  /** Write one full index generation atomically: populate a hidden
    * temp dir, commit with a single rename. A stale temp from a
    * crashed earlier attempt is cleared first; after the commit all
    * but the two newest generations are GC'd. */
  private def writeIvfGeneration(spark: org.apache.spark.sql.SparkSession,
                                 dir: String)(write: String => Unit): Unit = {
    val (fs, p) = graft.sources.Fs.on(spark, dir)
    fs.mkdirs(p)
    val nums = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.matches("gen-\\d+"))
      .map(_.stripPrefix("gen-").toLong)
    val next = if (nums.isEmpty) 0L else nums.max + 1L
    val tmp = s"$dir/.gen-tmp-$next"
    graft.sources.Fs.deleteRecursive(spark, tmp)
    write(tmp)
    if (!graft.sources.Fs.rename(spark, tmp, s"$dir/gen-$next"))
      throw new java.io.IOException(
        s"IVF index $dir: cannot commit generation $next (rename failed)")
    // GC: keep the new generation + one grace generation for readers
    // already pinned to the previous path
    nums.sorted.dropRight(1).foreach(n =>
      graft.sources.Fs.deleteRecursive(spark, s"$dir/gen-$n"))
    spark.catalog.refreshByPath(dir)
  }

  /** Query a persisted IVF index: the distinct probed cluster ids
    * (bounded by nCentroids) prune the scan to those PARTITIONS —
    * `PartitionFilters` on the index scan, plan-asserted in
    * `PlanQualitySpec`. Results are identical to `ivfKnn` over the same
    * corpus/parameters. */
  /** The quantizer sidecar of a persisted IVF index: the centroid
    * matrix is FIXED at build time — maintenance (appends, probes)
    * must reuse it verbatim, never re-train, or partition assignment
    * drifts between index generations. */
  private[graft] def readCentroids(spark: org.apache.spark.sql.SparkSession,
                                   dir: String): Array[Array[Double]] =
    readCentroidsAt(spark, resolveIvfGen(spark, dir))

  /** Sidecar read pinned to an ALREADY-RESOLVED generation dir: every
    * consumer that also reads the data files must resolve the
    * generation ONCE and use the same path for both — resolving twice
    * opens a window where a concurrent commit mixes one generation's
    * quantizer with another's partition layout (torn read). */
  private[graft] def readCentroidsAt(spark: org.apache.spark.sql.SparkSession,
                                     genDir: String): Array[Array[Double]] = {
    val json = graft.sources.Fs.readUtf8(spark, s"$genDir/_centroids.json")
    json.stripPrefix("[").stripSuffix("]")
      .split("\\],\\[").map(_.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.toDouble))
  }

  /** Incremental IVF maintenance — the accept-time half of the vector
    * ingest loop, mirroring `Dedup.appendToLshIndex`: a new vector
    * batch is assigned with the index's OWN sidecar centroids (the
    * fixed quantizer — never re-sampled, so assignment is consistent
    * across generations) and appended into the partitioned layout.
    * Every consumer keeps its guarantees: `ivfKnnIndexed` still prunes
    * to probed partitions and now sees the union corpus. One batch
    * pass, per-row codegen argmax, no shuffle.
    *
    * Id contract (same as `Dedup.appendToLshIndex`): the batch is
    * assumed to carry NEW ids — appending a re-ingested existing id
    * duplicates its index rows (duplicate neighbor hits until
    * cleanup). SAME-ID replace lifecycle (order matters — tombstones
    * filter by id, so they'd hide the new rows too): tombstone the
    * old id (reads honor it immediately), [[compactIvfIndex]] to a
    * new generation, DROP the tombstone entry, then append the new
    * version. */
  def appendToIvfIndex(batch: DataFrame, idCol: String, vecCol: String,
                       dir: String): Unit = {
    import graft.expressions.VectorExpressions.nearestCentroids
    val spark = batch.sparkSession
    // resolve the generation ONCE: sidecar and data write must come
    // from/land in the SAME generation, or a commit racing this append
    // would assign under one quantizer and write into another's layout
    val gen = resolveIvfGen(spark, dir)
    val matrix = readCentroidsAt(spark, gen)
    // appends land INSIDE the current generation (additive — a torn
    // append leaves a partial batch, retried idempotently at the
    // ingest-ledger level; a full rewrite is what needs the atomic
    // generation commit)
    batch.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", vecNorm(col("cv")))
      .withColumn("cent_id", element_at(nearestCentroids(col("cv"), matrix, 1), 1))
      .write.mode("append").partitionBy("cent_id").parquet(gen)
  }

  /** Physically rewrite a persisted IVF index minus the tombstoned
    * ids (the [[ivfKnnIndexed]] logical delete made durable), carrying
    * the sidecar centroids over verbatim (the quantizer is immutable).
    * Writes a NEW atomically-committed generation (see
    * [[buildIvfIndex]]'s crash-consistency contract): readers keep the
    * old generation until the single commit rename, so the in-place
    * form (fromDir == toDir) is safe and is the recommended shape —
    * a separate toDir still works for a cross-location migration.
    * One index scan, no re-assignment. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      fromDir: String, toDir: String,
                      tombstones: DataFrame, idCol: String): Unit = {
    val fromGen = resolveIvfGen(spark, fromDir)
    val sidecar = graft.sources.Fs.readUtf8(spark, s"$fromGen/_centroids.json")
    writeIvfGeneration(spark, toDir) { tmp =>
      spark.read.parquet(fromGen)
        .join(broadcast(tombstones.select(col(idCol).as("neighbor_id"))),
          Seq("neighbor_id"), "left_anti")
        .write.mode("overwrite").partitionBy("cent_id").parquet(tmp)
      graft.sources.Fs.writeUtf8(spark, s"$tmp/_centroids.json", sidecar)
    }
  }

  /** RE-QUANTIZE a persisted IVF index — the capacity-growth rebuild
    * (the IVF twin of `Dedup.rebucketLshIndex`, which is a pure
    * re-layout; here the physical unit IS the quantizer's partition,
    * so growth means a new quantizer). After months of
    * [[appendToIvfIndex]] batches under the immutable build-time
    * sidecar, the quantizer is stale two ways: per-partition row
    * masses have grown past what a probe should rerank, and the
    * centroid sample no longer reflects the corpus distribution that
    * appends shifted. This rebuild reads the INDEX (the vectors ride
    * in it — the source corpus is never touched), samples a fresh
    * `nCentroids`-wide quantizer from the union corpus with the same
    * deterministic md5-keyed rule as [[buildIvfIndex]], reassigns
    * per-row (codegen argmax, no shuffle), and writes a new
    * generation + sidecar. The result is IDENTICAL to a from-scratch
    * [[buildIvfIndex]] over the current corpus at `nCentroids` —
    * asserted against the q39 oracle — at one index scan instead of a
    * corpus read. Atomic generation commit like [[compactIvfIndex]]
    * (in-place fromDir == toDir safe; old generation serves until the
    * commit rename). */
  def retrainIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      fromDir: String, toDir: String,
                      nCentroids: Int): Unit = {
    import graft.expressions.VectorExpressions.nearestCentroids
    val fromGen = resolveIvfGen(spark, fromDir)
    val corpus = spark.read.parquet(fromGen).select(col("neighbor_id"), col("cv"))
    val matrix = sampledCentroids(corpus, "neighbor_id", "cv", nCentroids)
    val json = matrix.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeIvfGeneration(spark, toDir) { tmp =>
      corpus
        .withColumn("cn", vecNorm(col("cv")))
        .withColumn("cent_id", element_at(nearestCentroids(col("cv"), matrix, 1), 1))
        .write.mode("overwrite").partitionBy("cent_id").parquet(tmp)
      graft.sources.Fs.writeUtf8(spark, s"$tmp/_centroids.json", json)
    }
  }

  def ivfKnnIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                    queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, nProbe: Int,
                    tombstones: Option[DataFrame] = None): DataFrame = {
    import graft.expressions.VectorExpressions.nearestCentroids
    // ONE generation resolve for both the quantizer and the data scan
    // (a commit racing the query must not mix generations)
    val gen = resolveIvfGen(spark, dir)
    val matrix = readCentroidsAt(spark, gen)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", vecNorm(col("qv")))
      .withColumn("cent_id", explode(nearestCentroids(col("qv"), matrix, nProbe)))
    // distinct probed clusters: ≤ nCentroids values, safe to collect —
    // turning the probe set into a LITERAL predicate is what lets the
    // scan prune statically instead of reading every partition
    val probedIds = probes.select("cent_id").distinct().collect().map(_.getInt(0))
    // tombstones (deleted vector ids) broadcast-anti-join off the
    // pruned scan: deleted rows can no longer be NEIGHBORS; queries
    // are external probes and keep working even if their id was
    // deleted. Physical cleanup is [[compactIvfIndex]].
    val index = tombstones.foldLeft(
        spark.read.parquet(gen)
          .where(col("cent_id").isin(probedIds.toIndexedSeq: _*)))(
        (idx, t) => idx.join(
          broadcast(t.select(col(idCol).as("neighbor_id"))),
          Seq("neighbor_id"), "left_anti"))
    val cand = index.join(broadcast(probes), Seq("cent_id"))
      .where(col("query_id") =!= col("neighbor_id"))
    topKByCosine(cand, k)
  }

  /** Deterministic Lloyd's k-means refinement over an embedding column —
    * the quantizer-training step a real IVF index runs before
    * `buildIvfIndex` (which uses the raw sample as a coarse quantizer).
    *
    * Each of the `iters` rounds is:
    *  1. assignment — one corpus pass through the per-row codegen
    *     [[graft.expressions.CentroidAssignL2]] kernel (no join, no
    *     corpus shuffle);
    *  2. update — `posexplode` of assigned vectors, ONE map-combinable
    *     shuffle of (cluster, dim) partial sums (k·dim groups, tiny),
    *     means collected to the driver (k·dim doubles — bounded by the
    *     parameters, not the data).
    *
    * Total cost: `iters` corpus passes, each embarrassingly parallel —
    * the 100 TB shape. Determinism (and engine-portability, so a SQL
    * oracle replays the exact run):
    *  - init = the md5-hex-keyed content sample of `sampledCentroids`;
    *  - updated centroid means are ROUNDED to 6 dp in-plan before
    *    being fed back (summation-order noise never compounds across
    *    iterations);
    *  - empty clusters keep their previous centroid;
    *  - assignment ties break to the lowest cluster id.
    *
    * Output: (id, cluster, l2sq = round(squared distance to the final
    * centroid, 6)) — one row per corpus vector. */
  def kmeansRefine(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    import graft.expressions.VectorExpressions.centroidAssignL2
    val vecs = corpus.select(col(idCol), col(vecCol))
    var cents = sampledCentroids(corpus, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cluster",
        centroidAssignL2(col(vecCol), cents).getField("cluster"))
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)))
        .groupBy("cluster", "pos")
        .agg(round(avg(col("col").cast("double")), 6).as("w"))
        .collect()
      val next = cents.map(_.clone())
      val byCluster = means.groupBy(_.getInt(0))
      byCluster.foreach { case (c, rows) =>
        rows.foreach(r => next(c)(r.getInt(1)) = r.getDouble(2))
      }
      cents = next // clusters absent from `means` keep their old centroid
    }
    vecs.withColumn("__a", centroidAssignL2(col(vecCol), cents))
      .select(col(idCol), col("__a.cluster").as("cluster"),
        round(col("__a.l2sq"), 6).as("l2sq"))
  }

  /** Product-quantization ADC search (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): corpus vectors
    * compress to `m` per-subspace codebook indices
    * ([[graft.expressions.PqEncode]]); each query precomputes an
    * m × ks table of subspace distances ([[graft.expressions.PqLut]]);
    * the scan then scores every candidate with m table lookups
    * ([[graft.expressions.AdcDistance]]) instead of a dim-length
    * float loop. THE memory/bandwidth scale path for ANN: at 100 TB
    * the compressed codes (m bytes/vector vs 4·dim) fit node RAM, and
    * the scan is embarrassingly parallel — queries broadcast, the
    * corpus never shuffles (the top-k window partitions by query over
    * rank-k-bounded frames).
    *
    * Codebooks are the [[sampledCentroids]] md5-content sample sliced
    * per subspace — deterministic and oracle-reproducible (same c0
    * CTE as the q49 k-means replay); a trained codebook drops into
    * the same reference-object seam. Ranking follows the metric rule:
    * the ADC Σ (m doubles, engine-order) is rounded 6 dp BEFORE the
    * rank, ties broken by neighbor id.
    *
    * Output: (query_id, rank, neighbor_id, adc_dist) — top `k` by
    * ascending approximate squared L2, self-matches excluded. */
  def pqAdcSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, m: Int = 8, ks: Int = 16): DataFrame = {
    import graft.expressions.VectorExpressions.{adcDistance, pqEncode, pqLut}
    val sample = sampledCentroids(corpus, idCol, vecCol, ks)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val cb = Array.tabulate(m)(s => sample.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = corpus.select(col(idCol).as("neighbor_id"),
      pqEncode(col(vecCol), cb).as("__codes"))
    val probes = broadcast(queries.select(col(idCol).as("query_id"),
      pqLut(col(vecCol), cb).as("__lut")))
    val scored = encoded.join(probes, col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", round(adcDistance(col("__codes"), col("__lut")), 6))
    val w = Window.partitionBy("query_id").orderBy(asc("adc_dist"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc_dist")
  }

  /** PQ search with exact re-ranking (the IVFADC+R pipeline, Jégou
    * et al. 2011 §VI): the compressed [[pqAdcSearch]] scan nominates a
    * `shortlist`-sized candidate set per query, then ONLY those
    * candidates are re-scored against their full-precision vectors and
    * the top `k` re-ranked by exact squared L2. Quantization error
    * then only costs recall when a true neighbor falls outside the
    * whole shortlist — the standard accuracy/memory trade: the full
    * corpus is touched compressed, full vectors only for
    * |queries|·shortlist rows.
    *
    * Plan shape: the shortlist (tiny by construction) BROADCASTS back
    * onto the corpus scan for the vector fetch — the corpus is never
    * shuffled; the final ranking windows over ≤ shortlist rows per
    * query. Exact distances use the direct-fold
    * [[graft.expressions.VectorL2Sq]] (the oracle's op order), ranked
    * ROUNDED with id tiebreak (metric rule).
    *
    * Output: (query_id, rank, neighbor_id, l2_dist) — top `k`. */
  def pqRerankSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, shortlist: Int,
                     m: Int = 8, ks: Int = 16): DataFrame = {
    import graft.expressions.VectorExpressions.vecL2Sq
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = pqAdcSearch(corpus, queries, idCol, vecCol, shortlist, m, ks)
      .select(col("query_id"), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val fetched = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
    val w = Window.partitionBy("query_id").orderBy(asc("l2_dist"), asc("neighbor_id"))
    fetched
      .withColumn("l2_dist", round(vecL2Sq(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "l2_dist")
  }

  /** Cluster-vs-label agreement: k-means the embeddings, cross-tab the
    * clusters against the ground-truth labels, and report per cluster
    * its size, MAJORITY label and purity (majority count / cluster
    * size) — the standard embedding-quality eval (does unsupervised
    * geometry recover the labels?) that sits next to [[kmeansRefine]]
    * (the clustering), [[labelCentroidStats]] (the per-class profile)
    * and [[annRecallAtK]] (the retrieval eval).
    *
    * Determinism: clusters are [[kmeansRefine]]'s (deterministic init
    * + fixed iters); the majority tiebreaks on the smallest label;
    * purity is an exact-integer ratio rounded via the half-up micro
    * form (the q82 tie rule). Scale shape: the contingency table is
    * ONE map-combinable (cluster, label) shuffle of the assignment
    * frame — k·|labels| groups; `assigned` is cached (it feeds the
    * contingency AND its own final assignment pass; CacheScope-scoped).
    *
    * Output: (cluster, n_vecs, majority_label, n_majority, purity). */
  def clusterLabelPurity(emb: DataFrame, idCol: String, vecCol: String,
                         labelCol: String, k: Int, iters: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val assigned = kmeansRefine(emb, idCol, vecCol, k, iters).cache()
    val cont = assigned
      .join(emb.select(col(idCol), col(labelCol).as("__label")), idCol)
      .groupBy("cluster", "__label").agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("cluster")
      .orderBy(desc("__n"), asc("__label"))
    CacheScope.scoped(cont
      .withColumn("__tot", sum("__n").over(Window.partitionBy("cluster")))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("cluster"), col("__tot").as("n_vecs"),
        col("__label").as("majority_label"), col("__n").as("n_majority"),
        (intDiv(col("__n") * lit(2000000L) + col("__tot"), col("__tot") * 2)
          .cast("double") / 1e6).as("purity")), assigned)
  }

  /** Label-noise audit (the confident-learning shape, Northcutt et al.
    * 2021, majority-vote form): k-means the embeddings, take each
    * cluster's MAJORITY label as the geometry's vote, and flag every
    * vector whose own label disagrees — the candidate-mislabel queue a
    * curation pass sends to review. The per-vector companion of
    * [[clusterLabelPurity]] (that op scores clusters; this one names
    * the suspect rows).
    *
    * Determinism: clusters are [[kmeansRefine]]'s; the majority
    * tiebreaks on the smallest label; majority_frac is the exact-
    * integer ratio in half-up micro form (the q82 tie rule).
    *
    * Scale shape: the same ONE map-combinable (cluster, label)
    * contingency shuffle as the purity op, off a CACHED id-keyed
    * assignment⋈label frame that also feeds the verdict join; the
    * k-row majority frame BROADCASTS back — the corpus never joins
    * anything corpus-sized twice. Output: (id, cluster, label,
    * majority_label, n_majority, n_vecs, is_suspect, majority_frac). */
  def labelNoiseAudit(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, k: Int, iters: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val labeled = kmeansRefine(emb, idCol, vecCol, k, iters)
      .join(emb.select(col(idCol), col(labelCol).as("__label")), idCol)
      .cache()
    val cont = labeled.groupBy("cluster", "__label").agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy("cluster").orderBy(desc("__n"), asc("__label"))
    val maj = cont
      .withColumn("__tot", sum("__n").over(Window.partitionBy("cluster")))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("cluster"), col("__label").as("majority_label"),
        col("__n").as("n_majority"), col("__tot").as("n_vecs"))
    CacheScope.scoped(
      labeled.join(broadcast(maj), "cluster")
        .select(col(idCol), col("cluster"), col("__label").as("label"),
          col("majority_label"), col("n_majority"), col("n_vecs"),
          (col("__label") =!= col("majority_label")).as("is_suspect"),
          (intDiv(col("n_majority") * lit(2000000L) + col("n_vecs"),
            col("n_vecs") * 2).cast("double") / 1e6).as("majority_frac")),
      labeled)
  }

  /** Per-label embedding profile: count, the norm of the mean vector
    * and the mean per-vector norm — the drift/collapse diagnostics an
    * embedding pipeline tracks per class. One posexplode + ONE
    * map-combinable (label, dim) shuffle for the mean vector (k·dim
    * groups), one scalar-per-row pass for the norms — the corpus is
    * read once and never joined. Doubles are rounded at 6 dp (metric
    * rule); the mean is Σ/n computed identically in the oracle. */
  def labelCentroidStats(emb: DataFrame, labelCol: String, vecCol: String,
                         idCol: String): DataFrame = {
    val perDim = emb.select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .groupBy("label", "pos")
      .agg((sum(col("col").cast("double")) / count(lit(1))).as("m"))
    val centroidNorm = perDim.groupBy("label")
      .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
    val vecStats = emb.select(col(labelCol).as("label"),
        vecNorm(col(vecCol)).as("__n"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("__n")) / count(lit(1)), 6).as("avg_vec_norm"))
    vecStats.join(centroidNorm, "label")
      .select("label", "n_vecs", "centroid_norm", "avg_vec_norm")
  }

  /** Johnson–Lindenstrauss dimensionality reduction (Achlioptas 2003
    * ±1 form): project each embedding to `outDim` Rademacher
    * components — the storage/bandwidth path when full vectors are too
    * wide to ship (the complement of [[dimAblationRecall]], which
    * evaluates TRUNCATION; this is the projection that preserves
    * pairwise distance for any coordinate system).
    *
    * Determinism: [[graft.expressions.SignedProjection]]'s integer
    * contract — md5-derived signs, floor(v·2^20) quantization, exact
    * integer Σ — so `q_units` is bit-portable; `y` is the one derived
    * double (q_units / (2^20·√outDim)), identical op order both
    * engines, 6-dp rounded (metric rule).
    *
    * Scale shape: a per-row codegen kernel riding the scan — NO join,
    * NO shuffle, no state; the sign matrix is a reference object, not
    * a plan literal. Output: (id, proj_dim, q_units, y). */
  def jlProject(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                outDim: Int, seed: Long = 42L): DataFrame = {
    import graft.expressions.VectorExpressions.signedProjection
    emb.where(size(col(vecCol)) > 0)
      .select(col(idCol), posexplode(signedProjection(col(vecCol), dim, outDim, seed)))
      .select(col(idCol), col("pos").cast("long").as("proj_dim"),
        col("col").as("q_units"),
        round(col("col").cast("double")
          / (lit(1048576.0) * sqrt(lit(outDim.toDouble))), 6).as("y"))
  }

  /** Mutual-kNN graph (the graph-construction primitive under
    * agglomerative / community clustering, and the standard hub-killing
    * filter — Jarvis–Patrick 1973 shape): an edge (a, b) survives iff
    * b is in a's top-k AND a is in b's top-k among the LSH candidate
    * neighbors. Hub vertices fail mutuality; isolated vectors have no
    * candidates — both prunings are the point.
    *
    * Candidates are [[lshNearDupPairs]]' bucketed path (equi-join on
    * (table, signature-bucket) + 1-bit multi-probe — never O(n²));
    * ranking uses the 6-dp-ROUNDED cosine with id tiebreak (the rank
    * itself must be engine-portable); both directions rank the same
    * candidate set, so mutuality is exact given the candidates.
    *
    * Scale shape: candidate volume is bucket-bounded (nBits ~ log n);
    * per-node top-k prunes below the exchange (WindowGroupLimit); the
    * mutuality check is ONE equi-join of the ≤ k·n ranked frame onto
    * itself on the swapped (src, dst) key. Output: (id_a < id_b,
    * cos_sim, rank_ab, rank_ba). */
  def mutualKnnGraph(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int, dim: Int, nBits: Int = 8,
                     numTables: Int = 8): DataFrame = {
    val pairs = lshNearDupPairs(emb, idCol, vecCol, threshold = -1.0, dim,
        nBits, numTables)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos"))
      .cache()
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"), col("cos"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"), col("cos")))
    val w = Window.partitionBy("src").orderBy(desc("cos"), asc("dst"))
    val ranked = sym.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .cache()
    CacheScope.scoped(
      ranked.as("x").join(ranked.as("y"),
          col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
        .where(col("x.src") < col("x.dst"))
        .select(col("x.src").as("id_a"), col("x.dst").as("id_b"),
          col("x.cos").as("cos_sim"),
          col("x.rank").cast("long").as("rank_ab"),
          col("y.rank").cast("long").as("rank_ba")),
      pairs, ranked)
  }

  /** Per-dimension int8 scalar-quantization error profile — the
    * decision table for "can we ship these embeddings as int8?"
    * (embedding stores quantize to int8 for 4× bandwidth/RAM; the
    * profile says which dimensions lose how much). Per dim: affine
    * code = ((v−min)·255) / (max−min) over the corpus min/max,
    * reconstruction deq = min + code·(max−min)/255, error |v − deq|.
    *
    * Determinism: everything runs in the floor(v·2^20) integer-unit
    * domain — min/max/codes/deq/errors are exact BIGINT arithmetic
    * with non-negative operands (floor-vs-truncate rule), so SSE and
    * max-error are bit-portable; `rmse` is the one terminal derived
    * double (√ of an exact ratio — irrational, no 6-dp tie class).
    *
    * Scale shape: two scans of the exploded (n·dim) frame — pass 1 is
    * a combinable min/max/count agg to `dim` rows, which BROADCASTS
    * back onto pass 2 (never a shuffle of the big side); per-dim SSE
    * fits BIGINT to ~1e10 vectors (err ≤ range/255 ≤ 2^13 units,
    * err² ≤ 2^26). Output: (dim, n, min_q, max_q, max_err, sse,
    * rmse). */
  def int8QuantProfile(emb: DataFrame, vecCol: String): DataFrame = {
    val e = emb.where(size(col(vecCol)) > 0)
      .select(posexplode(col(vecCol)))
      .select(col("pos").cast("long").as("dim"),
        floor(col("col").cast("double") * lit(1048576.0)).as("vq"))
    val stats = e.groupBy("dim")
      .agg(count(lit(1)).as("n"), min("vq").as("min_q"), max("vq").as("max_q"))
    val rng = col("max_q") - col("min_q")
    val code = when(rng === 0, lit(0L))
      .otherwise(expr("((vq - min_q) * 255) div (max_q - min_q)"))
    val deq = col("min_q") + expr("(__code * (max_q - min_q)) div 255")
    e.join(broadcast(stats), "dim")
      .withColumn("__code", code)
      .withColumn("__err", abs(col("vq") - deq))
      .groupBy("dim")
      .agg(first("n").as("n"), first("min_q").as("min_q"),
        first("max_q").as("max_q"),
        max("__err").as("max_err"),
        sum(col("__err") * col("__err")).as("sse"))
      .select(col("dim"), col("n"), col("min_q"), col("max_q"),
        col("max_err"), col("sse"),
        round(sqrt(col("sse").cast("double") / col("n")) / lit(1048576.0), 6)
          .as("rmse"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH candidate generation
    * + exact verification — the scale path for pairwise near-dup: the
    * only join is an equi-join on (table, signature-bucket), so pairs
    * materialize ONLY for vectors landing in the same (or 1-bit-adjacent,
    * via one-sided multi-probe) bucket — never the O(n²) cross product.
    * Every candidate is then exact-cosine verified, so precision is 1;
    * recall is the LSH collision probability at the threshold (tune
    * nBits down / numTables up for higher recall; nBits should grow
    * ~log n to keep buckets bounded). Signatures are the portable
    * integer-quantized sign-random-projection (`LshSignatures`), so a
    * SQL oracle reproduces the exact candidate set.
    *
    * Oracle-equivalence assumption (documented, accepted): the final
    * `cos_sim >= threshold` filter compares an UNROUNDED double from
    * `VectorDot` against the oracle's own cosine code path. Both are
    * double left-to-right folds so they agree today; a pair landing
    * within ulps of the threshold could diverge at other scale
    * factors — surfacing as a hash-gate mismatch, not silent
    * corruption. The emitted cos_sim column itself is round(6)-
    * compared per the repo rule. */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, dim: Int, nBits: Int = 8,
                      numTables: Int = 8): DataFrame = {
    import graft.expressions.VectorExpressions.lshSignatures
    val base = emb.where(size(col(vecCol)) > 0)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), posexplode(lshSignatures(col("v"), dim, nBits, numTables)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "sig")
    // one-sided 1-bit multi-probe covers hamming≤1 pairs symmetrically
    val probed = base.withColumn("sig", explode(array_union(array(col("sig")),
      transform(sequence(lit(0), lit(nBits - 1)),
        i => col("sig").bitwiseXOR(call_function("shiftleft", lit(1L), i.cast("int")))))))
    val cand = probed.select(col("id").as("id_a"), col("t"), col("sig"))
      .join(base.select(col("id").as("id_b"), col("t"), col("sig")), Seq("t", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val withNorm = emb.select(col(idCol), col(vecCol))
      .withColumn("__n", vecNorm(col(vecCol)))
    cand
      .join(withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("__n").as("na")), "id_a")
      .join(withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("__n").as("nb")), "id_b")
      .withColumn("cos_sim", vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Embedding-cosine near-duplicate pairs ≥ threshold, EXACT all-pairs
    * form: a self-join over id-ordered pairs with one codegen'd dot per
    * pair — O(n²), the spec-level recall oracle for `lshNearDupPairs`,
    * not a shape to ship at scale. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val withNorm = emb.select(col(idCol), col(vecCol))
      .withColumn("__n", vecNorm(col(vecCol)))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("__n").as("na"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("__n").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Per-dimension embedding distribution profile: n, mean, population
    * std, min, max for every vector position — the drift/health report
    * an embedding pipeline checks before normalizing or whitening a
    * corpus (a dead dimension has std 0; a scale-skewed one dominates
    * L2 distances). One posexplode + ONE map-combinable (dim)-key
    * shuffle — `dim` groups total, corpus read once, never joined.
    * Doubles rounded 6dp (metric rule); std uses the population form
    * √(Σx²/n − mean²), clamped at 0 against rounding. */
  def embeddingDimStats(emb: DataFrame, vecCol: String): DataFrame = {
    emb.select(posexplode(col(vecCol)))
      .select(col("pos"), col("col").cast("double").as("x"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        (sum(col("x")) / count(lit(1))).as("__m"),
        (sum(col("x") * col("x")) / count(lit(1))).as("__m2"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      .select(col("pos"), col("n"),
        round(col("__m"), 6).as("mean_x"),
        round(sqrt(greatest(col("__m2") - col("__m") * col("__m"), lit(0.0))), 6)
          .as("std_x"),
        round(col("min_x"), 6).as("min_x"),
        round(col("max_x"), 6).as("max_x"))
  }

  /** Recall@k of the LSH ANN path against the exact brute-force
    * ranking — the eval harness an ANN deployment runs on a QUERY
    * SAMPLE before trusting approximate search at scale (tune nBits /
    * numTables until the sampled recall clears target). Both legs are
    * deterministic here (portable signatures, id tiebreaks), so even
    * this evaluation is oracle-exact.
    *
    * Scale shape: the O(n·|queries|) brute-force leg is the cost —
    * that is inherent to ground truth and is why `queries` is a small
    * sample; the comparison itself is two k·|queries|-row aggregates.
    *
    * Output: one row per query — (query_id, n_truth, n_hits,
    * recall = n_hits/n_truth rounded 6dp). */
  def annRecallAtK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, dim: Int, nBits: Int = 8,
                   numTables: Int = 8): DataFrame = {
    val truth = bruteForceKnn(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = lshKnn(corpus, queries, idCol, vecCol, k, dim, nBits, numTables)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    // mark-and-aggregate in ONE pass over truth: the expensive
    // brute-force leg must not be computed once for n_truth and again
    // for the hit join (plan-guarded: a single BNLJ in the whole plan)
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("query_id"), col("n_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 6).as("recall"))
  }

  /** Embedding-dimension ablation (the Matryoshka-representation
    * question, Kusupati et al. 2022: "how much recall does a truncated
    * prefix keep?"): for each d in `dims`, recall@k of the exact top-k
    * under PREFIX-d cosine against the full-dimension top-k truth —
    * the eval a pipeline runs before storing truncated embeddings to
    * cut index cost.
    *
    * Scale shape: queries broadcast (ANN-workload contract, as
    * [[bruteForceKnn]]); the corpus streams once per ablation point
    * (|dims|+1 scans — an eval over a broadcastable query set, each
    * scan embarrassingly parallel, nothing ever shuffles the corpus);
    * rank ties break on neighbor id (metric rule); recall counts are
    * exact integers.
    *
    * Output: one row per (query, d) — (query_id, dims, n_truth,
    * n_hits, recall 6 dp). */
  def dimAblationRecall(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty)
    val truth = bruteForceKnn(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val byDim = dims.map { d =>
      val q = broadcast(queries
        .select(col(idCol).as("query_id"), slice(col(vecCol), 1, d).as("qv"))
        .withColumn("qn", vecNorm(col("qv"))))
      val c = corpus
        .select(col(idCol).as("neighbor_id"), slice(col(vecCol), 1, d).as("cv"))
        .withColumn("cn", vecNorm(col("cv")))
      topKByCosine(c.join(q, col("query_id") =!= col("neighbor_id")), k)
        .select(col("query_id"), col("neighbor_id"), lit(d).as("dims"))
    }.reduce(_ unionAll _)
    val truthCnt = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
    byDim
      .join(truth.withColumn("__t", lit(1L)), Seq("query_id", "neighbor_id"), "left")
      .groupBy("dims", "query_id")
      .agg(sum(coalesce(col("__t"), lit(0L))).as("n_hits"))
      .join(truthCnt, "query_id")
      .select(col("query_id"), col("dims"), col("n_truth"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_truth"), 6).as("recall"))
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then look
    * for near-duplicates ONLY within a cluster — the published trick
    * that turns O(n²) semantic dedup into Σ_c O(n_c²) with n_c bounded
    * by growing k with the corpus. Reference scope: the
    * training-data-pipeline extension family (SURVEY §2 extensions),
    * sibling of `lshNearDupPairs`.
    *
    * Clustering is the deterministic [[kmeansRefine]] run (md5-keyed
    * init, 6-dp-rounded means), so a SQL oracle replays the identical
    * partition. Within a cluster, a vector is DROPPED when any
    * smaller-id cluster-mate has cosine ≥ `threshold` (keep-one-
    * representative, lowest id wins — SemDeDup keeps one point per
    * ε-ball). The threshold compares the 6-dp-ROUNDED cosine on both
    * engines (metric-double rule), so the verdict cannot flip on libm
    * ulps.
    *
    * Scale shape: the only join is the within-cluster equi-join — no
    * cross-cluster pair ever materializes (plan-guarded: no BNLJ /
    * cartesian). Per-pair work is one codegen `VectorDot`.
    *
    * Output: one row per vector — (id, cluster, n_dups = #smaller-id
    * near-dup cluster-mates, max_cos = their max rounded cosine or NULL,
    * keep = n_dups == 0). */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, threshold: Double): DataFrame = {
    // `assigned` feeds BOTH sides of the within-cluster self-join (via
    // `sided`) and the final output join — uncached, the iterative
    // kmeansRefine lineage (cost grows with iters·k) would re-execute
    // up to three times. CacheScope-scoped: released after the first
    // action on the returned frame.
    val assigned = kmeansRefine(emb, idCol, vecCol, k, iters)
      .select(col(idCol), col("cluster"))
      .persist()
    val sided = assigned.join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("__n", vecNorm(col(vecCol)))
    val a = sided.select(col(idCol).as("id"), col("cluster"),
      col(vecCol).as("va"), col("__n").as("na"))
    val b = sided.select(col(idCol).as("id_b"), col("cluster"),
      col(vecCol).as("vb"), col("__n").as("nb"))
    val dups = a.join(b, Seq("cluster"))
      .where(col("id_b") < col("id"))
      .withColumn("cos_sim",
        round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cos_sim") >= threshold)
      .groupBy("id")
      .agg(count(lit(1)).as("n_dups"), max("cos_sim").as("max_cos"))
    CacheScope.scoped(assigned.select(col(idCol).as("id"), col("cluster"))
      .join(dups, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("max_cos"),
        (coalesce(col("n_dups"), lit(0L)) === 0L).as("keep")), assigned)
  }

  /** Hard-negative mining: for each query vector, the top-k most
    * cosine-similar corpus vectors carrying a DIFFERENT label — the
    * standard contrastive-training data step (retrieval/embedding
    * models train on "looks like the anchor but isn't its class";
    * random negatives are too easy to carry gradient).
    *
    * Exactly [[bruteForceKnn]]'s shape — broadcast queries (with their
    * labels), label-inequality predicate fused into the broadcast
    * join, shared [[topKByCosine]] tail (6-dp rounding + id tiebreak
    * happen in one place) — so its scale path is the same as kNN's:
    * swap the brute candidate generator for the LSH/IVF index probe
    * and keep the label filter on the probe result. Output adds the
    * neighbor's label for downstream triplet assembly.
    *
    * Output: (query_id, rank, neighbor_id, neighbor_label, sim). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("__qlabel"))
      .withColumn("qn", vecNorm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("neighbor_label"))
      .withColumn("cn", vecNorm(col("cv")))
    val cand = c.join(q, col("neighbor_label") =!= col("__qlabel") &&
      col("query_id") =!= col("neighbor_id"))
    topKByCosine(cand, k, carry = Seq("neighbor_label"))
  }

  /** Embedding outlier audit — the sanity pass an embedding column gets
    * BEFORE indexing or clustering: flag zero vectors (an upstream
    * encoder failure mode: empty input → all-zero output, which breaks
    * cosine everywhere downstream) and norm outliers (|norm − μ| >
    * z·σ — truncated inputs, fp8/overflow corruption, wrong-model
    * rows all show up as norm excursions first).
    *
    * Determinism: the norm snaps to integer micro (floor(‖v‖·1e6), the
    * q130 snap rule; ‖v‖ is the [[graft.expressions.VectorExpressions.vecNorm]]
    * left-to-right double fold both engines share), then μ and σ² come
    * from exact integer moments on the snapped micros (half-up intDiv
    * mean, E[x²]−E[x]² variance — the q130 form, Σx² in DECIMAL(38,0))
    * and the flag is the INTEGER comparison (x−μ)² > z²·σ² — no double
    * crosses a row boundary, so no row's verdict depends on
    * partitioning or summation order.
    *
    * Scale shape: one scan computes the norms; the 3-cell moment
    * aggregate broadcasts back as a 1-row frame (the q91/q110
    * pattern); the flags ride a second pass over the same scan —
    * stateless, no shuffle of the corpus. Output: (id, norm_micro,
    * is_zero, is_outlier). */
  /** Per-dimension z-score standardization of the embedding matrix —
    * the whitening-lite transform an ANN/clustering stage applies so no
    * single high-variance dimension dominates L2/cosine geometry
    * (PQ codebooks and k-means centroids both assume roughly isotropic
    * coordinates; raw encoder outputs are not).
    *
    * Determinism: each coordinate snaps to integer micro
    * (floor(x·1e6) — identical double→floor in both engines), then the
    * per-dim moments are EXACT integer arithmetic: the mean uses the
    * min-shift half-up form (half-up(Σx/n) = half-up(Σ(x−min)/n) + min,
    * exact for integer min — keeps the intDiv operands non-negative
    * per the CLAUDE.md negative-division rule), E[x²] the q130 half-up
    * micro form (Σx² in DECIMAL(38,0)), var = max(0, E[x²] − mean²).
    * z floor-snaps the shared double expression
    * ((x−mean)/√var)·1e6 — one identical op sequence per engine.
    * Zero-variance dims emit NULL (a constant coordinate carries no
    * geometry and must not fabricate ±∞).
    *
    * Scale shape: one posexplode scan → |dims|-row moment frame →
    * broadcast back onto the same stream; shuffles touch |dims| rows,
    * never the corpus. Output: (id, pos INT, z_micro BIGINT). */
  def standardizeEmbeddings(emb: DataFrame, idCol: String,
                            vecCol: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val dec = "decimal(38,0)"
    val x = emb
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "__x")))
      .select(col(idCol), col("pos").cast("int").as("pos"),
        floor(col("__x").cast("double") * lit(1e6)).cast("long").as("__xm"))
    val stats = x.groupBy("pos").agg(
        count(lit(1)).as("__n"), sum("__xm").as("__s"),
        min("__xm").as("__mn"),
        sum(col("__xm").cast(dec) * col("__xm").cast(dec)).as("__s2"))
      .select(col("pos"),
        (intDiv(lit(2L) * (col("__s") - col("__n") * col("__mn")) + col("__n"),
          lit(2L) * col("__n")) + col("__mn")).cast("long").as("__mean"),
        intDiv(lit(2L) * col("__s2") + col("__n").cast(dec),
          lit(2L) * col("__n").cast(dec)).cast("long").as("__ex2"))
      .select(col("pos"), col("__mean"),
        greatest(lit(0L), col("__ex2") - col("__mean") * col("__mean")).as("__var"))
    x.join(broadcast(stats), "pos")
      .select(col(idCol), col("pos"),
        when(col("__var") > 0L,
          floor((col("__xm") - col("__mean")).cast("double") /
            sqrt(col("__var").cast("double")) * lit(1e6)).cast("long"))
          .as("z_micro"))
  }

  def embeddingOutlierProfile(emb: DataFrame, idCol: String, vecCol: String,
                              zThresh: Int = 3): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val dec = "decimal(38,0)"
    val base = emb.select(col(idCol),
      floor(vecNorm(col(vecCol)) * lit(1e6)).cast("long").as("norm_micro"))
    val stats = base.agg(count(lit(1)).as("__n"), sum("norm_micro").as("__s"),
        sum(col("norm_micro").cast(dec) * col("norm_micro").cast(dec)).as("__s2"))
      .select(
        intDiv(lit(2L) * col("__s") + col("__n"), lit(2L) * col("__n")).as("__mean"),
        intDiv(lit(2L) * col("__s2") + col("__n").cast(dec),
          lit(2L) * col("__n").cast(dec)).as("__ex2"))
      .select(col("__mean"),
        // ±1-unit half-up undershoot can push E[x²]−E[x]² below zero
        // on a constant column — clamp (the q130 rule)
        greatest(lit(0L), col("__ex2") - col("__mean") * col("__mean")).as("__var"))
    base.crossJoin(broadcast(stats))
      .select(col(idCol), col("norm_micro"),
        (col("norm_micro") === 0L).as("is_zero"),
        ((col("norm_micro") - col("__mean")) * (col("norm_micro") - col("__mean")) >
          lit(zThresh.toLong * zThresh) * col("__var")).as("is_outlier"))
  }

  /** Per-label centroid compactness — the class-geometry audit run
    * before labels gate a contrastive/classification training run: for
    * each label, how tightly its vectors hug their own centroid (mean
    * and worst cosine-to-centroid). A label with low mean compactness
    * is noisy or multi-modal (SemDeDup/label-noise territory); a
    * min_cos near −1 is a mislabeled outlier.
    *
    * Determinism: float components snap to the exact micro lattice
    * (floor(x·1e6) — one pinned double op), so the per-(label, dim)
    * sums and the half-up (away-from-zero for negatives) component
    * means are exact integers; the centroid both engines score against
    * is the IDENTICAL micro-lattice vector. Per-row cosine is the q21
    * parity path (codegen [[graft.expressions.VectorDot]] vs the
    * oracle's list cosine) rounded to micro; aggregates over those
    * snapped integers are exact (mean shifted +1e6 to keep the intDiv
    * operands non-negative — cos ≥ −1). Zero-norm vectors (and a
    * degenerate zero centroid) score NULL, counted in n_vecs but not
    * n_scored.
    *
    * Scale shape: one (label, dim) combinable shuffle for the centroid
    * sums (|labels|·dim rows), centroids re-assembled and BROADCAST
    * back onto one corpus scan, one |labels|-group combinable fold. No
    * pairwise anything. Output: (label, n_vecs, n_scored,
    * mean_cos_micro, min_cos_micro). */
  def labelCentroidCompactness(emb: DataFrame, idCol: String, vecCol: String,
                               labelCol: String, dim: Int = 64): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    // Fixed dimensionality is part of the contract (the q140 idiom): a
    // stray wrong-length vector would otherwise skew per-dim centroid
    // counts AND be scored against a centroid it didn't shape — both
    // sides (engine and oracle) exclude it instead.
    val emb0 = emb.where(size(col(vecCol)) === dim)
    val comp = emb0
      .select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .toDF("label", "dim", "__x")
      .select(col("label"), col("dim"),
        floor(col("__x").cast("double") * lit(1e6)).cast("long").as("__cm"))
    val sums = comp.groupBy("label", "dim")
      .agg(sum("__cm").as("__s"), count(lit(1)).as("__n"))
    val cmean = when(col("__s") >= 0,
      intDiv(lit(2L) * col("__s") + col("__n"), lit(2L) * col("__n")))
      .otherwise(-intDiv(lit(-2L) * col("__s") + col("__n"), lit(2L) * col("__n")))
    val cent = sums.select(col("label"), col("dim"), cmean.as("__c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("__c")))),
        x => x.getField("__c").cast("double") / lit(1e6)).as("__cvec"))
    val scored = emb0.select(col(labelCol).as("label"), col(vecCol).as("__v"))
      .join(broadcast(cent), "label")
      .select(col("label"),
        when(vecDot(col("__v"), col("__v")) > 0 &&
             vecDot(col("__cvec"), col("__cvec")) > 0,
          round(cosine(col("__v"), col("__cvec")) * lit(1e6), 0).cast("long"))
          .as("__cosm"))
    scored.groupBy("label").agg(
      count(lit(1)).as("n_vecs"),
      count(col("__cosm")).as("n_scored"),
      when(count(col("__cosm")) > 0,
        intDiv(lit(2L) * sum(col("__cosm") + lit(1000000L)) + count(col("__cosm")),
          lit(2L) * count(col("__cosm"))) - lit(1000000L)).as("mean_cos_micro"),
      min("__cosm").as("min_cos_micro"))
  }

  /** Mergeable second-moment sketch of a fixed-dim embedding column:
    * buffer = [n, Σx (dim), upper-triangular Σ x·xᵀ (dim·(dim+1)/2)]
    * — 2 145 doubles for dim = 64, ONE pass, commutative merge. The
    * covariance matrix (and so PCA) of 10⁹ vectors reduces to this one
    * constant-size accumulator: the same map-combined shape as the HLL
    * /KMV sketches, never a second scan, never a shuffle of vectors.
    * Wrong-length vectors are ignored (callers pre-filter `size = dim`
    * — the q140 contract — so the guard only protects the buffer). */
  final class GramMatrixAgg(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + dim + tri)
    override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      if (v == null || v.length != dim) return b
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = v(i).toDouble; i += 1 }
      b(0) += 1
      i = 0
      var k = 1 + dim
      while (i < dim) {
        b(1 + i) += x(i)
        var j = i
        while (j < dim) { b(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Seq[Double] = r.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.Encoders.kryo[Array[Double]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Top principal component of the embedding distribution — the
    * whitening / dominant-direction primitive (embedding drift audits,
    * anisotropy checks, "is one feature dimension eating the cosine"
    * diagnostics). DEFINED as exactly `iters` power-iteration steps
    * from the all-ones vector on the population covariance
    * C = Σxxᵀ/n − μμᵀ, L2-normalized each step — a fixed deterministic
    * computation both engines replay op-for-op (+,−,×,÷,√ are all
    * IEEE-correctly-rounded; no transcendentals), independent of
    * whether the iteration has converged. Eigenvalue = the Rayleigh
    * quotient vᵀCv of the final vector. Sign canonicalized: the
    * largest-|loading| dimension (smallest index on ties) is made
    * non-negative. Output: (dim, loading, eigval) rounded to 6 (sum
    * order across engines differs at ~1e-15; round-6 absorbs it, the
    * repo's cosine convention).
    *
    * Scale shape: ONE corpus scan into the constant-size
    * [[GramMatrixAgg]] sketch; the 64×64 eigen-iteration is driver-side
    * on 2 145 collected doubles (parameter-bounded, like the IVF
    * centroid build). Precondition: a non-degenerate corpus (C ≠ 0);
    * a zero covariance freezes the iterate rather than dividing by 0.
    */
  def topPrincipalComponent(emb: DataFrame, vecCol: String, dim: Int = 64,
                            iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    covarianceFromSketch(emb, vecCol, dim) match {
      case None => Seq.empty[(Long, Double, Double)]
        .toDF("dim", "loading", "eigval")
      case Some((_, c)) =>
        val (v, lam) = powerIterate(c, dim, iters)
        val sgn = canonicalSign(v)
        (0 until dim).map(d => (d.toLong, r6(sgn * v(d)), r6(lam)))
          .toDF("dim", "loading", "eigval")
    }
  }

  /** Top-`nComponents` principal spectrum by DEFLATION: after each
    * component, subtract λ·vvᵀ and re-run the fixed power iteration —
    * the same defined-op-sequence contract as
    * [[topPrincipalComponent]] (deflation is +,−,× only; vvᵀ is
    * sign-invariant, so canonicalization stays an output-side
    * concern). `var_share` = λ_c / trace(C): the variance-explained
    * curve that decides how many dimensions a truncation (q99's
    * Matryoshka eval, JL targets, PQ codebook sizing) can drop.
    * Scale shape identical to q166: ONE corpus scan into the
    * [[GramMatrixAgg]] sketch, everything after is driver math on
    * 2 145 doubles. */
  def principalSpectrum(emb: DataFrame, vecCol: String, dim: Int = 64,
                        nComponents: Int = 4, iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    covarianceFromSketch(emb, vecCol, dim) match {
      case None => Seq.empty[(Long, Long, Double, Double, Double)]
        .toDF("component", "dim", "loading", "eigval", "var_share")
      case Some((_, c0)) =>
        var trace = 0.0
        var i = 0
        while (i < dim) { trace += c0(i)(i); i += 1 }
        val comps = spectrumComponents(c0, dim, nComponents, iters)
        val out = for {
          (comp, (v, lam)) <- comps.zipWithIndex.map(_.swap)
          sgn = canonicalSign(v)
          d <- 0 until dim
        } yield (comp.toLong, d.toLong, r6(sgn * v(d)), r6(lam),
          if (trace > 0) r6(lam / trace) else 0.0)
        out.toDF("component", "dim", "loading", "eigval", "var_share")
    }
  }

  /** One collected [[GramMatrixAgg]] sketch → (mean vector, dense
    * population covariance); None on an empty corpus. Driver memory is
    * dim² — parameter-bounded. */
  private def covarianceFromSketch(emb: DataFrame, vecCol: String,
      dim: Int): Option[(Array[Double], Array[Array[Double]])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val flat = emb.where(size(col(vecCol)) === dim)
      .agg(udaf(new GramMatrixAgg(dim)).apply(col(vecCol)))
      .as[Seq[Double]].head()
    sketchCov(flat, dim).map { case (_, mu, c) => (mu, c) }
  }

  /** A collected [[GramMatrixAgg]] buffer → (n, mean, population
    * covariance); None when the sketch saw no rows. The ONE place the
    * g/n − μᵢμⱼ formula lives (oracle-mirrored op order). */
  private def sketchCov(flat: Seq[Double], dim: Int)
      : Option[(Double, Array[Double], Array[Array[Double]])] = {
    val n = flat(0)
    if (n == 0) return None
    val mu = Array.tabulate(dim)(i => flat(1 + i) / n)
    val c = Array.ofDim[Double](dim, dim)
    var k = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = flat(k) / n - mu(i) * mu(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1; k += 1
      }
      i += 1
    }
    Some((n, mu, c))
  }

  /** Per-label embedding-subspace drift: each label's top principal
    * component (fixed `iters` power steps, the q166 contract) and its
    * ALIGNMENT |v_label · v_global| with the corpus-wide component —
    * the "did one subpopulation come from a different encoder /
    * distribution" audit. |cos| is sign-invariant, so no
    * canonicalization enters the comparison. The global component is
    * derived from the element-wise SUM of the per-label sketches —
    * [[GramMatrixAgg]]'s mergeability doing the work: one grouped scan
    * yields every label's sketch AND the corpus sketch.
    *
    * Scale shape: ONE |labels|-keyed combinable shuffle of constant-
    * size buffers; all eigen math is driver-side on |labels|·2 145
    * doubles (bounded-collect contract). Precondition: each label has
    * non-zero covariance (a frozen degenerate iterate would desync
    * from the oracle's NaN — same documented class as q165/q166).
    * Output: (label, n_vecs, eigval, align), round-6. */
  def labelPrincipalAlignment(emb: DataFrame, labelCol: String,
                              vecCol: String, dim: Int = 64,
                              iters: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.where(size(col(vecCol)) === dim)
      .groupBy(col(labelCol).cast("int").as("label"))
      .agg(udaf(new GramMatrixAgg(dim)).apply(col(vecCol)).as("sk"))
      .as[(Int, Seq[Double])].collect()
      .sortBy(_._1)
    if (rows.isEmpty) return Seq.empty[(Int, Long, Double, Double)]
      .toDF("label", "n_vecs", "eigval", "align")
    val gflat = rows.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    val Some((_, _, gc)) = sketchCov(gflat, dim): @unchecked
    val (gv, _) = powerIterate(gc, dim, iters)
    rows.flatMap { case (label, flat) =>
      sketchCov(flat, dim).map { case (n, _, c) =>
        val (v, lam) = powerIterate(c, dim, iters)
        var a = 0.0
        var i = 0
        while (i < dim) { a += v(i) * gv(i); i += 1 }
        (label, n.toLong, r6(lam), r6(math.abs(a)))
      }
    }.toSeq.toDF("label", "n_vecs", "eigval", "align")
  }

  /** Top-`nComponents` (vector, eigenvalue) pairs by power iteration
    * with deflation (C ← C − λ·v_i·v_j after each, left-to-right —
    * the op order the q167 oracle mirrors). Vectors are UNFLIPPED
    * (vvᵀ is sign-invariant; canonicalization is output-side). */
  private def spectrumComponents(c0: Array[Array[Double]], dim: Int,
      nComponents: Int, iters: Int): Seq[(Array[Double], Double)] = {
    var c = c0
    val out = Seq.newBuilder[(Array[Double], Double)]
    var comp = 0
    while (comp < nComponents) {
      val (v, lam) = powerIterate(c, dim, iters)
      out += ((v, lam))
      val next = Array.ofDim[Double](dim, dim)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { next(i)(j) = c(i)(j) - lam * v(i) * v(j); j += 1 }
        i += 1
      }
      c = next
      comp += 1
    }
    out.result()
  }

  /** PCA-residual outlier audit: residual energy
    * ‖x − μ‖² − Σ_c ((x−μ)·v_c)² per vector — variance the top
    * principal components can NOT explain — ranked descending, top-N.
    * The full-covariance upgrade of the per-dim z-score audit (q140):
    * a vector that is extreme ALONG the corpus's dominant directions
    * is ordinary; one with mass outside their span is structurally
    * anomalous (corrupt embedding, wrong encoder version, adversarial
    * row). Ordering is on the ROUNDED residual with the id tiebreak so
    * both engines cut the same top-N boundary.
    *
    * Scale shape: the spectrum comes from the ONE-pass sketch
    * (q166/q167); μ and the component matrix then ride a SECOND corpus
    * scan as a codegen reference object — per-row cost is
    * (nComponents+1) fused dot products, the top-N is TakeOrdered
    * (per-partition heads, no global sort materialization). */
  def pcaResidualOutliers(emb: DataFrame, idCol: String, vecCol: String,
                          dim: Int = 64, nComponents: Int = 4,
                          iters: Int = 8, topN: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    covarianceFromSketch(emb, vecCol, dim) match {
      case None => Seq.empty[(Long, Int, Double)]
        .toDF(idCol, "rank", "residual")
      case Some((mu, c0)) =>
        val comps = spectrumComponents(c0, dim, nComponents, iters)
          .map(_._1).toArray
        val scored = emb.where(size(col(vecCol)) === dim)
          .select(col(idCol),
            round(graft.expressions.VectorExpressions
              .residualEnergy(col(vecCol), mu, comps), 6).as("residual"))
          .orderBy(col("residual").desc, col(idCol))
          .limit(topN)
        scored.withColumn("rank",
          row_number().over(Window.orderBy(col("residual").desc, col(idCol))))
          .select(col(idCol), col("rank"), col("residual"))
    }
  }

  /** `iters` fixed power-iteration steps from the all-ones vector;
    * returns (final unit vector, Rayleigh quotient). A zero matvec
    * norm freezes the iterate (degenerate-input contract). */
  private def powerIterate(c: Array[Array[Double]], dim: Int,
                           iters: Int): (Array[Double], Double) = {
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { r =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += c(r)(j) * v(j); j += 1 }
        s
      }
    var v = Array.fill(dim)(1.0)
    var it = 0
    while (it < iters) {
      val u = matvec(v)
      var nsq = 0.0
      var i = 0
      while (i < dim) { nsq += u(i) * u(i); i += 1 }
      val norm = math.sqrt(nsq)
      if (norm > 0) { var i2 = 0; while (i2 < dim) { u(i2) = u(i2) / norm; i2 += 1 }; v = u }
      it += 1
    }
    val u = matvec(v)
    var lam = 0.0
    var i = 0
    while (i < dim) { lam += v(i) * u(i); i += 1 }
    (v, lam)
  }

  private def canonicalSign(v: Array[Double]): Double = {
    var best = 0
    var i = 1
    while (i < v.length) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
    if (v(best) < 0) -1.0 else 1.0
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
