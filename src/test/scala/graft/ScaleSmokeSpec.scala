package graft

import graft.operators.{Dedup, Graph, Sampling}
import graft.sources.Datagen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Load-proof for the 100-TB design claims (VERDICT r9 item 5): the
  * plan-shape guards in PlanQualitySpec pin WHAT the hot paths do;
  * this spec measures HOW their wall-time actually grows when the
  * corpus grows 10×, end-to-end on a synthetic near-dup corpus from
  * the engine's own Datagen.
  *
  * Opt-in (slow): set SPARK_GRAFT_SCALE_SMOKE=1 — e.g.
  *   SPARK_GRAFT_SCALE_SMOKE=1 sbt "testOnly graft.ScaleSmokeSpec"
  * Otherwise every test cancels, keeping `sbt test` fast.
  *
  * What is asserted:
  *  - wall-time growth at 10× data stays under ratio 30 per operator
  *    (exponent < log(30)/log(10) ≈ 1.48 — catches anything quadratic,
  *    which would read ~100×, while tolerating shuffle log factors and
  *    per-stage scheduling overhead that DEFLATES the small run);
  *  - the driver's retained heap does not grow with corpus size
  *    (bounded-collect contract: everything driver-side is
  *    parameter-bounded, so 10× data must not show up on the heap).
  *
  * The measured exponents on an idle host are recorded in
  * ARCHITECTURE.md §"Scale smoke"; they are evidence, not the gate —
  * the gate is the ratio bound, loose enough to be host-stable. */
class ScaleSmokeSpec extends SparkSpec {

  // tier 1 (=1): 3k vs 30k over all seven ops; tier 2 (=2): also the
  // 30k vs 300k spot check on the four scan-dominated paths — 100×
  // the bench fixture's corpus
  private val tier = sys.env.get("SPARK_GRAFT_SCALE_SMOKE")
    .flatMap(_.toIntOption).getOrElse(0)
  private val enabled = tier >= 1
  // optional comma-separated op subset (iterating on one operator's
  // growth without the full-suite soak)
  private val opFilter = sys.env.get("SPARK_GRAFT_SCALE_OPS")
    .map(_.split(",").map(_.trim).toSet)
  private val n1 = 3000L
  private val n2 = 30000L

  /** The hot paths the verdict named: q19 pairs, q47 clustering,
    * q158 index build+pairs, q109 leakage split, q111 contamination,
    * q112 cluster stats, q178 graph manifest. Each consumes the docs
    * frame end-to-end and materializes its result with count(). */
  private def ops: Seq[(String, DataFrame => Unit)] = allOps
    .filter { case (n, _) => opFilter.forall(_.contains(n)) }

  private def allOps: Seq[(String, DataFrame => Unit)] = Seq(
    "q19_pairs" -> { docs =>
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8).count(); ()
    },
    "q47_clusters" -> { docs =>
      Dedup.dedupClusters(docs, "doc_id", "text", 3, 64, 16, 0.8).count(); ()
    },
    "q158_index_build_pairs" -> { docs =>
      Dedup.buildLshIndex(docs, "doc_id", "text", "lsh_idx_smoke", 3, 64, 16)
      try Dedup.lshPairsIndexed(spark, "lsh_idx_smoke", "doc_id", 64, 0.8).count()
      finally spark.sql("DROP TABLE IF EXISTS lsh_idx_smoke")
      ()
    },
    "q109_leakage_split" -> { docs =>
      Sampling.leakageSafeSplit(docs, "doc_id", "text", 3, 64, 16, 0.8,
        holdoutKeep = 10).count(); ()
    },
    "q111_contamination" -> { docs =>
      val b = Sampling.md5Bucket("doc_id", 100)
      Dedup.evalSpanContamination(docs.where(b < 80), docs.where(b >= 80),
        "doc_id", "text", k = 10).count(); ()
    },
    "q112_cluster_stats" -> { docs =>
      Dedup.dupClusterStats(docs, "doc_id", "text", 3, 64, 16, 0.8).count(); ()
    },
    "q178_graph_manifest" -> { docs =>
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.8)
        .cache()
      try Graph.manifest(pairs, Dedup.connectedComponentsStar(pairs)).count()
      finally pairs.unpersist()
      ()
    },
    // the PRODUCTION q178 shape (round 10): pairs read from the
    // persisted bucketed index, then the PR/k-core chains — the
    // suite's most stage-latency-bound plan, so its growth is the one
    // the 100× tier most needs to see (VERDICT r10 item 5). Timed
    // end-to-end including the index build: at scale the build is the
    // scan-dominated part and the chains are round-latency-dominated,
    // so a superlinear regression in EITHER shows in the ratio.
    "q178_manifest_indexed" -> { docs =>
      Dedup.buildLshIndex(docs, "doc_id", "text", "lsh_idx_smoke178",
        3, 64, 16)
      try {
        val pairs = Dedup.lshPairsIndexed(spark, "lsh_idx_smoke178",
          "doc_id", 64, 0.8).cache()
        try Graph.manifest(pairs, Dedup.connectedComponentsStar(pairs)).count()
        finally pairs.unpersist()
      } finally spark.sql("DROP TABLE IF EXISTS lsh_idx_smoke178")
      ()
    },
    // the exact-substr family (round 12, VERDICT r11 item 2): the
    // covered-runs interval union + binary search over run lengths is
    // the heaviest NON-indexed loop in the suite (Dedup.scala
    // longestSpanSearch — df-agg + join back, islands windows, ~log(L)
    // bounded-collect rounds with per-round localCheckpoint). Expected
    // shape: scan-linear per round with a round count that grows only
    // with the LONGEST duplicated run (log), so the 10×/100× exponent
    // should stay near 1 — measured here because nothing indexed
    // amortizes it
    "q101_exact_substr" -> { docs =>
      Dedup.exactSubstrStats(docs, "doc_id", "text", k = 10).count(); ()
    },
    // NOT .count(): the stripped frame's bounds join has a unique-key
    // right side, so count() lets Catalyst eliminate the join and the
    // strip expression entirely — consume the output column to measure
    // the real work
    "q160_strip_spans" -> { docs =>
      Dedup.stripDupSpans(docs, "doc_id", "text", k = 10)
        .agg(sum(length(col("clean_text")))).collect(); ()
    },
    // the REAL codec path (round 11): per-row PNG encode → decode →
    // NN resize → re-encode → decode. Pure per-partition CPU with no
    // shuffle at all — the expected exponent is ~1 (linear in rows),
    // and the ratio bound catches any accidental materialization
    "q197_codec_roundtrip" -> { docs =>
      val media = graft.operators.Multimodal.synthesizeGrayPng(
        docs, "doc_id", "text", w = 8, h = 8)
      graft.operators.Multimodal.decodeImageFeatures(
        graft.operators.Multimodal.resizeImage(media, 4, 4)).count()
      ()
    },
    // the streaming path (round 12): a stateful watermarked tumble
    // aggregation replayed through StreamReplay over 10× the rows —
    // staging is scan-linear, but the STATE is bounded by open
    // windows (720 here), not rows, so the exponent should sit near
    // the scan's. A superlinear reading would mean per-row state or a
    // state-store commit path that scales with data — the regression
    // the streaming gates can't see at fixture size.
    "stream_tumble_replay" -> { docs =>
      val baseUs = 1704067200000000L
      val tsUs = lit(baseUs) + pmod(col("doc_id"), lit(720L)) * 3600000000L
      val ev = docs.select(timestamp_micros(tsUs).as("ts"),
        length(col("text")).cast("double").as("value"), tsUs.as("__ord"))
      val sentinelTs = baseUs + 723L * 3600000000L
      val spark0 = docs.sparkSession
      import spark0.implicits._
      val sentinel = Seq(1).toDF("__x").select(
        timestamp_micros(lit(sentinelTs)).as("ts"), lit(0.0).as("value"),
        lit(sentinelTs).as("__ord"))
      val dir = java.nio.file.Files.createTempDirectory("smoke-replay").toString
      graft.streaming.StreamReplay.replayAppend(ev, "__ord",
          s"$dir/stage", slices = 5,
          queryName = s"smoke_tumble_${System.nanoTime()}",
          sentinel = Some(sentinel)) { s =>
        s.withWatermark("ts", "0 seconds")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      }.count()
      ()
    },
    // the checkpointed-restart path (round 13, VERDICT r12 item 5):
    // the S1 upsert pipeline through the statement runner with the
    // process "killed" after half the epochs and a NEW runner resumed
    // on the same topics + checkpoints. Measures RECOVERY cost at
    // scale: checkpoint resume + view hydration must be
    // metadata-bounded and the epoch-idempotent sink writes every row
    // exactly once regardless of the restart, so the exponent should
    // track the scan — a superlinear reading would mean recovery
    // re-reads or re-writes something row-scaled.
    "stream_restart_runner" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-restart").toString)
      val feed = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      def newRunner(): graft.exec.StreamingStatementRunner = {
        val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
        r.registerTopicSource("smoke_feed", StructType(Seq(
          StructField("doc_id", LongType), StructField("n_chars", LongType))))
        r.runScript("""
          CREATE TABLE smoke_latest (doc_id BIGINT, n_chars BIGINT,
            PRIMARY KEY (doc_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
          INSERT INTO smoke_latest SELECT doc_id, n_chars FROM smoke_feed""")
        r
      }
      val epochs = 4
      def feedEpoch(r: graft.exec.StreamingStatementRunner, i: Int): Unit = {
        graft.sources.Topics.appendJson(
          feed.where(pmod(col("doc_id"), lit(epochs)) === i),
          "smoke_feed", conf, Nil, i + 1)
        r.processAllAvailable()
      }
      val r1 = newRunner()
      (0 until epochs / 2).foreach(feedEpoch(r1, _))
      r1.stopAll()
      val r2 = newRunner()
      (epochs / 2 until epochs).foreach(feedEpoch(r2, _))
      r2.stopAll()
      spark0.table("smoke_latest").count()
      ()
    },
    // the merge-on-write joined aggregate (round 14): stream JOIN dim
    // GROUP BY through the statement runner. Per epoch the delta is
    // scan-linear but the MERGE is O(delta groups ⋈ prior groups) with
    // the group space fixed at 8 — so the exponent should track the
    // scan. A superlinear reading would mean the merge rewrites
    // row-scaled state (the O(live groups)-per-batch regression the
    // delta-driven left join exists to prevent).
    "stream_merge_agg" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      import spark0.implicits._
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-merge").toString)
      val feed = docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(64L)).as("grp_id"),
        length(col("text")).cast("double").as("n_chars"))
      (0L until 64L).map(i => (i, s"g${i % 8}")).toDF("gid", "gname")
        .createOrReplaceTempView("smoke_ma_dim")
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_ma_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("grp_id", LongType),
        StructField("n_chars", DoubleType))))
      r.runScript("""
        CREATE TABLE smoke_ma_stats (gname STRING, n_docs BIGINT, total DOUBLE,
          PRIMARY KEY (gname) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_ma_stats
        SELECT d.gname, count(*) AS n_docs,
               CAST(sum(CAST(f.n_chars AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM smoke_ma_feed f JOIN smoke_ma_dim d ON f.grp_id = d.gid
        GROUP BY d.gname""")
      val epochs = 4
      (0 until epochs).foreach { i =>
        graft.sources.Topics.appendJson(
          feed.where(pmod(col("doc_id"), lit(epochs)) === i),
          "smoke_ma_feed", conf, Nil, i + 1)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_ma_stats").count()
      ()
    },
    // ChangelogNormalize at scale (round 15, VERDICT r14 item 1): the
    // per-live-key normalize state is exactly what grows with key
    // cardinality at 100 TB. Epoch i ADDS quarter i of the keys and
    // REVISES every key already live — so live-key state, total
    // revision volume, AND per-key revision depth all scale with the
    // corpus. The downstream retract-fold (sum-decomposable, 16 fixed
    // groups) is cheap by construction, so the reading isolates
    // normalize: state lookups + signed expansion, sharded on the
    // aggregate's own exchange. Expected exponent ~1 (revision-volume
    // linear); superlinear would mean per-key state is being rescanned
    // rather than point-updated.
    "stream_changelog_normalize" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-cn").toString)
      val feed = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_cn_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType))))
      r.runScript("""
        CREATE TABLE smoke_cn_latest (doc_id BIGINT, n_chars BIGINT,
          PRIMARY KEY (doc_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_cn_latest SELECT doc_id, n_chars FROM smoke_cn_feed;
        CREATE TABLE smoke_cn_stats (bucket BIGINT, n BIGINT, total BIGINT,
          PRIMARY KEY (bucket) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_cn_stats
        SELECT CAST(doc_id % 16 AS BIGINT) AS bucket, count(*) AS n,
               sum(n_chars) AS total
        FROM smoke_cn_latest GROUP BY CAST(doc_id % 16 AS BIGINT)""")
      val epochs = 4
      (0 until epochs).foreach { i =>
        graft.sources.Topics.appendJson(
          feed.where(pmod(col("doc_id"), lit(epochs)) <= i)
            .withColumn("n_chars", col("n_chars") + i),
          "smoke_cn_feed", conf, Nil, i + 1)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_cn_stats").count()
      ()
    },
    // the value-multiset path at scale (round 15, VERDICT r14 item 1):
    // min/max/count(DISTINCT) share ONE per-(group, value) multiset
    // whose pair count scales with live keys (val_id is key-unique),
    // and every epoch CHANGES every live key's value — old pair
    // tombstones, new pair adds — so the helper-topic state read,
    // touched-pair write, and live-value stats recompute are all
    // exercised at corpus-scaled cardinality. Expected exponent ~1
    // (touched pairs per epoch are revision-volume linear, the group
    // space is fixed at 16); superlinear would mean the recompute or
    // the pair merge rescans the UNTOUCHED multiset.
    "stream_multiset_agg" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-vs").toString)
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_vs_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("val_id", LongType))))
      r.runScript("""
        CREATE TABLE smoke_vs_latest (doc_id BIGINT, val_id BIGINT,
          PRIMARY KEY (doc_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_vs_latest SELECT doc_id, val_id FROM smoke_vs_feed;
        CREATE TABLE smoke_vs_stats (bucket BIGINT, n BIGINT, mn BIGINT,
          mx BIGINT, nd BIGINT,
          PRIMARY KEY (bucket) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_vs_stats
        SELECT CAST(doc_id % 16 AS BIGINT) AS bucket, count(*) AS n,
               min(val_id) AS mn, max(val_id) AS mx,
               count(DISTINCT val_id) AS nd
        FROM smoke_vs_latest GROUP BY CAST(doc_id % 16 AS BIGINT)""")
      val epochs = 4
      (0 until epochs).foreach { i =>
        graft.sources.Topics.appendJson(
          docs.select(col("doc_id"),
            (col("doc_id") * epochs + i).as("val_id"))
            .where(pmod(col("doc_id"), lit(epochs)) <= i),
          "smoke_vs_feed", conf, Nil, i + 1)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_vs_stats").count()
      ()
    },
    // the FIFO provenance normalizer + arrival-ordered multiset at
    // scale (round 15): first/last over a RETRACT-mode topic — the
    // content-keyed pending-add queues AND the (ord, value) pair
    // multiset both scale with live rows. Epoch i adds quarter i and
    // RETRACTS half of quarter i−1 (content-identical -U rows), so
    // state grows while FIFO pops run at corpus-scaled volume.
    // Expected exponent ~1; superlinear would mean the normalizer
    // rescans state per row or the multiset recompute reads beyond
    // touched groups.
    "stream_fifo_firstlast" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-fl").toString)
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_fl_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("n_chars", LongType),
        StructField("__op", StringType))))
      r.runScript("""
        CREATE TABLE smoke_fl_log (doc_id BIGINT, n_chars BIGINT, __op STRING)
          WITH ('changelog.mode' = 'retract');
        INSERT INTO smoke_fl_log SELECT doc_id, n_chars, __op FROM smoke_fl_feed;
        CREATE TABLE smoke_fl_stats (bucket BIGINT, n BIGINT, f BIGINT, l BIGINT,
          PRIMARY KEY (bucket) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_fl_stats
        SELECT CAST(doc_id % 16 AS BIGINT) AS bucket, count(*) AS n,
               first(doc_id) AS f, last(doc_id) AS l
        FROM smoke_fl_log GROUP BY CAST(doc_id % 16 AS BIGINT)""")
      val epochs = 4
      val feed = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      (0 until epochs).foreach { i =>
        val adds = feed.where(pmod(col("doc_id"), lit(epochs)) === i)
          .withColumn("__op", lit("+I"))
        val batch =
          if (i == 0) adds
          else adds.unionByName(
            feed.where(pmod(col("doc_id"), lit(epochs)) === (i - 1) &&
              pmod(col("doc_id"), lit(2L * epochs)) < epochs)
              .withColumn("__op", lit("-U")))
        graft.sources.Topics.appendJson(batch, "smoke_fl_feed", conf, Nil, i + 1)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_fl_stats").count()
      ()
    },
    // the round-16 REGULAR JOIN (startRegularJoin): per epoch the fact
    // log grows by n/4 and an eighth of the dim keys revise, so every
    // epoch pays Δfact ⋈ dim (new enrichments) + Δdim ⋈ factLog
    // (retract + re-emit of the revised keys' past facts). Both terms
    // are scan-linear in the fact log with the dim broadcast — expected
    // exponent ≈ 1; anything re-reading state per ROW would read ~2
    "stream_regular_join" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-rj").toString)
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_rj_dim_feed", StructType(Seq(
        StructField("bucket", LongType), StructField("label", StringType))))
      r.registerTopicSource("smoke_rj_fact_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("bucket", LongType),
        StructField("n_chars", LongType))))
      r.runScript("""
        CREATE TABLE smoke_rj_dim (bucket BIGINT, label STRING,
          PRIMARY KEY (bucket) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_rj_dim SELECT bucket, label FROM smoke_rj_dim_feed;
        CREATE TABLE smoke_rj_enr (doc_id BIGINT, label STRING, n_chars BIGINT,
          __op STRING) WITH ('changelog.mode' = 'retract');
        INSERT INTO smoke_rj_enr (doc_id, label, n_chars)
        SELECT f.doc_id, d.label, f.n_chars
        FROM smoke_rj_fact_feed f JOIN smoke_rj_dim d ON f.bucket = d.bucket""")
      val epochs = 4
      val feed = docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(256L)).as("bucket"),
        length(col("text")).cast("long").as("n_chars"))
      (0 until epochs).foreach { i =>
        val allDims = spark0.range(256).select(col("id").as("bucket"),
          concat(lit(s"v$i-"), col("id")).as("label"))
        val dims = if (i == 0) allDims
          else allDims.where(pmod(col("bucket"), lit(8)) === (i % 8))
        graft.sources.Topics.appendJson(dims, "smoke_rj_dim_feed", conf, Nil, 2 * i + 1)
        r.processAllAvailable()
        graft.sources.Topics.appendJson(
          feed.where(pmod(col("doc_id"), lit(epochs)) === i),
          "smoke_rj_fact_feed", conf, Nil, 2 * i + 2)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_rj_enr").count()
      ()
    },
    // the round-17 CHAINED LEFT OUTER regular join (the per-side
    // bracket engine): fact LEFT JOIN dim1 LEFT JOIN dim2, both dims
    // revising an eighth of their keys per epoch. A dim revision pays
    // its inner-flip delta term (broadcastable Δdim against the fact
    // log) plus two anti-join pad evaluations over preserved state —
    // all scan-linear in the fact log; expected exponent ≈ 1. Half the
    // facts pad at level 1 (dim1 covers even buckets only), so the pad
    // algebra is exercised at every scale, not just the happy path
    "stream_chained_join" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-cj").toString)
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_cj_dim1_feed", StructType(Seq(
        StructField("bucket", LongType), StructField("label", StringType))))
      r.registerTopicSource("smoke_cj_dim2_feed", StructType(Seq(
        StructField("grp", LongType), StructField("tag", StringType))))
      r.registerTopicSource("smoke_cj_fact_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("bucket", LongType),
        StructField("grp", LongType), StructField("n_chars", LongType))))
      r.runScript("""
        CREATE TABLE smoke_cj_dim1 (bucket BIGINT, label STRING,
          PRIMARY KEY (bucket) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_cj_dim1 SELECT bucket, label FROM smoke_cj_dim1_feed;
        CREATE TABLE smoke_cj_dim2 (grp BIGINT, tag STRING,
          PRIMARY KEY (grp) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_cj_dim2 SELECT grp, tag FROM smoke_cj_dim2_feed;
        CREATE TABLE smoke_cj_enr (doc_id BIGINT, label STRING, tag STRING,
          n_chars BIGINT, __op STRING) WITH ('changelog.mode' = 'retract');
        INSERT INTO smoke_cj_enr (doc_id, label, tag, n_chars)
        SELECT f.doc_id, d1.label, d2.tag, f.n_chars
        FROM smoke_cj_fact_feed f
        LEFT JOIN smoke_cj_dim1 d1 ON f.bucket = d1.bucket
        LEFT JOIN smoke_cj_dim2 d2 ON f.grp = d2.grp""")
      val epochs = 4
      val feed = docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(256L)).as("bucket"),
        pmod(col("doc_id"), lit(64L)).as("grp"),
        length(col("text")).cast("long").as("n_chars"))
      (0 until epochs).foreach { i =>
        val d1 = spark0.range(0, 256, 2).select(col("id").as("bucket"),
          concat(lit(s"v$i-"), col("id")).as("label"))
        val dims1 = if (i == 0) d1
          else d1.where(pmod(col("bucket"), lit(8)) === ((2 * (i % 4)) % 8))
        graft.sources.Topics.appendJson(dims1, "smoke_cj_dim1_feed", conf, Nil, 2 * i + 1)
        val d2 = spark0.range(64).select(col("id").as("grp"),
          concat(lit(s"t$i-"), col("id")).as("tag"))
        val dims2 = if (i == 0) d2
          else d2.where(pmod(col("grp"), lit(8)) === (i % 8))
        graft.sources.Topics.appendJson(dims2, "smoke_cj_dim2_feed", conf, Nil, 2 * i + 1)
        r.processAllAvailable()
        graft.sources.Topics.appendJson(
          feed.where(pmod(col("doc_id"), lit(epochs)) === i),
          "smoke_cj_fact_feed", conf, Nil, 2 * i + 2)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_cj_enr").count()
      ()
    },
    // the round-18 MULTI-USE (self-join) regular join: a CTE over the
    // fact feed referenced twice pairs each doc with its sibling
    // (pair_key = doc_id/2 → ≤ 1 pair per key, so OUTPUT stays linear
    // and the exponent isolates ENGINE cost), joined to a dim revising
    // an eighth of its keys per epoch. Each fact delta joins BOTH
    // occurrence sides' shared log (equi on pair_key — scan-linear);
    // a dim revision re-emits via one fact-log scan per bracket term.
    // Expected exponent ≈ 1; superlinear would mean an occurrence
    // side re-reads state per row or the shared-slot ownership broke
    "stream_selfjoin" -> { docs =>
      import org.apache.spark.sql.types._
      val spark0 = docs.sparkSession
      val conf = graft.sources.TopicConf(
        java.nio.file.Files.createTempDirectory("smoke-sj").toString)
      val r = new graft.exec.StreamingStatementRunner(spark0, topicConf = Some(conf))
      r.registerTopicSource("smoke_sj_dim_feed", StructType(Seq(
        StructField("bucket", LongType), StructField("label", StringType))))
      r.registerTopicSource("smoke_sj_fact_feed", StructType(Seq(
        StructField("doc_id", LongType), StructField("pair_key", LongType),
        StructField("bucket", LongType))))
      r.runScript("""
        CREATE TABLE smoke_sj_dim (bucket BIGINT, label STRING,
          PRIMARY KEY (bucket) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO smoke_sj_dim SELECT bucket, label FROM smoke_sj_dim_feed;
        CREATE TABLE smoke_sj_pairs (id1 BIGINT, id2 BIGINT, label STRING,
          __op STRING) WITH ('changelog.mode' = 'retract');
        INSERT INTO smoke_sj_pairs (id1, id2, label)
        WITH e AS (SELECT doc_id, pair_key, bucket FROM smoke_sj_fact_feed)
        SELECT a.doc_id, b.doc_id, d.label
        FROM e a
        JOIN e b ON a.pair_key = b.pair_key AND a.doc_id < b.doc_id
        JOIN smoke_sj_dim d ON a.bucket = d.bucket""")
      val epochs = 4
      val feed = docs.select(col("doc_id"),
        (col("doc_id") / 2).cast("long").as("pair_key"),
        pmod(col("doc_id"), lit(256L)).as("bucket"))
      (0 until epochs).foreach { i =>
        val allDims = spark0.range(256).select(col("id").as("bucket"),
          concat(lit(s"v$i-"), col("id")).as("label"))
        val dims = if (i == 0) allDims
          else allDims.where(pmod(col("bucket"), lit(8)) === (i % 8))
        graft.sources.Topics.appendJson(dims, "smoke_sj_dim_feed", conf, Nil, 2 * i + 1)
        r.processAllAvailable()
        graft.sources.Topics.appendJson(
          feed.where(pmod(col("doc_id"), lit(epochs)) === i),
          "smoke_sj_fact_feed", conf, Nil, 2 * i + 2)
        r.processAllAvailable()
      }
      r.stopAll()
      spark0.table("smoke_sj_pairs").count()
      ()
    })

  private def corpus(n: Long): DataFrame =
    // materialized once per scale so generation cost is not billed to
    // the operators (real corpora are parquet, not a projection)
    Datagen.documentsBatch(spark, n).localCheckpoint()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Retained-heap measurement that accounts for Spark's ASYNC block
    * cleanup: in local mode the executor block store shares the
    * driver heap, and the iterative operators' per-round
    * `localCheckpoint` blocks are only freed when the ContextCleaner
    * notices their RDDs are unreachable — minutes after the query, if
    * the JVM is busy. Everything is done when this is called, so
    * first drop every still-registered block deterministically, then
    * poll gc until the reading stabilizes (min of 20 samples). What
    * remains is genuinely retained driver state. */
  private def usedHeapMb(): Long = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val rt = Runtime.getRuntime
    var best = Long.MaxValue
    var i = 0
    while (i < 20) {
      System.gc(); Thread.sleep(300)
      best = math.min(best, (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024))
      i += 1
    }
    best
  }

  test("dedup/graph hot paths grow near-linearly from 1x to 10x; driver heap stays flat") {
    assume(enabled, "set SPARK_GRAFT_SCALE_SMOKE=1 to run the scale smoke")
    // JIT/codegen warmup on a tiny corpus so the 1x run isn't billed
    // compilation cost that the 10x run inherits for free
    val warm = corpus(500)
    ops.foreach { case (_, f) => f(warm); spark.catalog.clearCache() }
    warm.unpersist()

    val small = corpus(n1)
    val t1 = ops.map { case (name, f) =>
      val t = time(f(small)); spark.catalog.clearCache(); name -> t
    }
    small.unpersist()
    val heapAfterSmall = usedHeapMb()

    val big = corpus(n2)
    val t2 = ops.map { case (name, f) =>
      val t = time(f(big)); spark.catalog.clearCache(); name -> t
    }
    big.unpersist()
    val heapAfterBig = usedHeapMb()

    val report = t1.zip(t2).map { case ((name, a), (_, b)) =>
      val ratio = b / a
      val exponent = math.log(ratio) / math.log(n2.toDouble / n1)
      f"$name%-24s ${a}%8.2fs -> ${b}%8.2fs  ratio ${ratio}%6.2fx  exp ${exponent}%5.2f"
    }.mkString("\n")
    info(s"scale smoke ${n1} -> ${n2} rows:\n$report")
    info(s"driver heap after 1x: ${heapAfterSmall} MB; after 10x: ${heapAfterBig} MB")

    t1.zip(t2).foreach { case ((name, a), (_, b)) =>
      assert(b / a < 30.0,
        f"$name grew ${b / a}%.1fx on 10x data (exp ${math.log(b / a) / math.log(10)}%.2f) — superlinear; plan regressed:\n$report")
    }
    // bounded-collect contract: a 10x corpus must not appear on the
    // driver heap (centroids/probe buckets/domain vectors are all
    // parameter-bounded). 512 MB of slack absorbs JVM noise; a
    // corpus-sized collect at n2 (30k docs x ~400 B text + plan
    // overhead) would blow well past it if anything data-sized leaked.
    assert(heapAfterBig - heapAfterSmall < 512,
      s"driver heap grew ${heapAfterBig - heapAfterSmall} MB from 1x to 10x — something corpus-sized is retained driver-side")
  }

  test("100x spot check: sketch/cluster/index paths stay sublinear at 300k docs") {
    assume(tier >= 2, "set SPARK_GRAFT_SCALE_SMOKE=2 for the 100x tier")
    // sizing: the exact-substr family at 300k docs needs
    // SPARK_DRIVER_MEM=16g (cached positional-gram frame ~120M rows +
    // per-round broadcasts exceed the default 8g shared local JVM —
    // local-mode heap arithmetic, not a plan property; see
    // ARCHITECTURE.md §Scale smoke)
    // the four scan-dominated paths plus the indexed graph manifest at
    // 30k vs 300k — 100x the bench fixture's 3k-doc corpus. The
    // manifest rides along in its PRODUCTION indexed form because it
    // is the suite's most stage-latency-bound plan (VERDICT r10 item
    // 5); the from-scratch graph/binary-search composites stay
    // tier-1-only (their cost is round latency, not scan volume, and
    // 300k-doc runs of 25-stage composites make the spot check an
    // hour-long soak, not a smoke).
    // round 12 adds the exact-substr family (q101/q111/q160): the
    // covered-runs binary search is scan-dominated per round with a
    // log-bounded round count, so unlike the other composites its
    // 300k-doc run is a smoke, not a soak — and its scaling exponent
    // was the last unmeasured non-indexed hot path (VERDICT r11 item 2)
    // the streaming replay rides along (round 12): its cost is bounded
    // by windows × triggers, so the 100× reading should stay flat —
    // the cheapest superlinear-state tripwire in the tier
    // round 13 adds the restart runner: recovery cost (checkpoint
    // resume + view hydration) must stay metadata-bounded at 100×
    // SPARK_GRAFT_SCALE_SMOKE_ONLY=<comma-names> narrows the spot set
    // (round 17): measuring ONE new operator's exponent no longer pays
    // for the whole battery
    val only = sys.env.get("SPARK_GRAFT_SCALE_SMOKE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spot = ops.filter { case (n, _) =>
      only.map(_.contains(n)).getOrElse(
      Set("q19_pairs", "q47_clusters", "q158_index_build_pairs",
        "q112_cluster_stats", "q178_manifest_indexed",
        "q101_exact_substr", "q111_contamination", "q160_strip_spans",
        "stream_tumble_replay", "stream_restart_runner",
        "stream_merge_agg",
        // round 15 (VERDICT r14 item 1): the two NEW stateful paths —
        // normalize's per-live-key state and the per-(group, value)
        // multiset — are precisely the states that grow with key/value
        // cardinality at 100 TB, so they ride both tiers
        "stream_changelog_normalize", "stream_multiset_agg",
        // round 16 (VERDICT r15 item 1): the regular join's fact log is
        // the state that grows with corpus size — the Δdim ⋈ factLog
        // re-emission term must stay scan-linear at 100×
        "stream_fifo_firstlast", "stream_regular_join",
        // round 17: the chained LEFT OUTER bracket engine's per-level
        // pads must stay scan-linear at 100× too
        "stream_chained_join",
        // round 18: the multi-use (self-join) per-occurrence sides
        // share one fact log — both sides' reads must stay scan-linear
        "stream_selfjoin").contains(n))
    }
    val warm = corpus(500)
    spot.foreach { case (_, f) => f(warm); spark.catalog.clearCache() }
    warm.unpersist()
    val mid = corpus(30000L)
    val t1 = spot.map { case (name, f) =>
      val t = time(f(mid)); spark.catalog.clearCache(); name -> t
    }
    mid.unpersist()
    val heapMid = usedHeapMb()
    val huge = corpus(300000L)
    val t2 = spot.map { case (name, f) =>
      val t = time(f(huge)); spark.catalog.clearCache(); name -> t
    }
    huge.unpersist()
    val heapHuge = usedHeapMb()
    val report = t1.zip(t2).map { case ((name, a), (_, b)) =>
      f"$name%-24s ${a}%8.2fs -> ${b}%8.2fs  ratio ${b / a}%6.2fx  exp ${math.log(b / a) / math.log(10)}%5.2f"
    }.mkString("\n")
    info(s"100x spot (30k -> 300k rows):\n$report")
    info(s"driver heap after 30k: ${heapMid} MB; after 300k: ${heapHuge} MB")
    t1.zip(t2).foreach { case ((name, a), (_, b)) =>
      assert(b / a < 30.0, s"$name superlinear at 300k:\n$report")
    }
    assert(heapHuge - heapMid < 512,
      s"driver heap grew ${heapHuge - heapMid} MB from 30k to 300k")
  }

  test("1000x tier: third decade (300k -> 3M docs) — log-factor family, LSH banding, a regular-join drain") {
    assume(tier >= 3, "set SPARK_GRAFT_SCALE_SMOKE=3 for the 1000x tier")
    // Round 20 (VERDICT r19 item 4): q101 exact-substr is the only hot
    // path over exponent 1.0 at the 100x tier (1.11 — the known
    // window-sort log factor), and log-factor growth is exactly what
    // another decade exposes; LSH banding (q19) and one regular-join
    // drain ride along. Sizing: q101's cached positional-gram frame is
    // ~1.2 G rows at 3M docs — run with SPARK_DRIVER_MEM=48g (the
    // caches spill MEMORY_AND_DISK, but per-round broadcasts need JVM
    // headroom; the tier-2 16g note, one decade up). This is a ~90 min
    // soak, the per-round opt-in ceiling — keep the spot set to the
    // three ops the decade actually interrogates.
    val only = sys.env.get("SPARK_GRAFT_SCALE_SMOKE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spot = ops.filter { case (n, _) =>
      only.map(_.contains(n)).getOrElse(
        Set("q101_exact_substr", "q19_pairs", "stream_regular_join")
          .contains(n))
    }
    val warm = corpus(500)
    spot.foreach { case (_, f) => f(warm); spark.catalog.clearCache() }
    warm.unpersist()
    val mid = corpus(300000L)
    val t1 = spot.map { case (name, f) =>
      val t = time(f(mid)); spark.catalog.clearCache(); name -> t
    }
    mid.unpersist()
    val heapMid = usedHeapMb()
    val huge = corpus(3000000L)
    val t2 = spot.map { case (name, f) =>
      val t = time(f(huge)); spark.catalog.clearCache(); name -> t
    }
    huge.unpersist()
    val heapHuge = usedHeapMb()
    val report = t1.zip(t2).map { case ((name, a), (_, b)) =>
      f"$name%-24s ${a}%8.2fs -> ${b}%8.2fs  ratio ${b / a}%6.2fx  exp ${math.log(b / a) / math.log(10)}%5.2f"
    }.mkString("\n")
    info(s"1000x spot (300k -> 3M rows):\n$report")
    info(s"driver heap after 300k: ${heapMid} MB; after 3M: ${heapHuge} MB")
    t1.zip(t2).foreach { case ((name, a), (_, b)) =>
      assert(b / a < 30.0, s"$name superlinear at 3M:\n$report")
    }
    // 1 GB slack (vs the lower tiers' 512 MB): at 3M docs the spilled
    // cache/broadcast bookkeeping legitimately retains more JVM-side
    // metadata; a corpus-sized leak (~1.2 GB of text alone) still blows it
    assert(heapHuge - heapMid < 1024,
      s"driver heap grew ${heapHuge - heapMid} MB from 300k to 3M")
  }
}
