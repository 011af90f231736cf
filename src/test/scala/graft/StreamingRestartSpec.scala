package graft

import graft.exec.StreamingStatementRunner
import graft.sources.{TopicConf, Topics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fault tolerance of the long-running INSERT path (VERDICT r12 item 1):
  * the reference's `confluent_flink_statement` INSERTs are durable,
  * restart-surviving jobs — the platform checkpoints them and their
  * sinks are effectively-once. The engine mirrors that with (a) a
  * per-statement `checkpointLocation` under the topic root, so a new
  * runner on the same `TopicConf` RESUMES each INSERT from committed
  * offsets, and (b) epoch-idempotent topic appends keyed on
  * (statement id, batchId), so a crash-replayed micro-batch overwrites
  * its own records instead of double-appending them. */
class StreamingRestartSpec extends SparkSpec {
  import spark.implicits._

  private def freshConf() = TopicConf(
    java.nio.file.Files.createTempDirectory("graft-restart").toString)

  private val evSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("v", DoubleType)))

  private def feed(conf: TopicConf, topic: String, epoch: Long,
                   rows: (Long, Double)*): Unit =
    Topics.appendJson(rows.toSeq.toDF("user_id", "v"), topic, conf, Nil, epoch)

  private def script(suffix: String) = s"""
    CREATE TABLE user_latest_$suffix (
      user_id BIGINT, v DOUBLE,
      PRIMARY KEY (user_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
    INSERT INTO user_latest_$suffix SELECT user_id, v FROM ev_feed_$suffix"""

  private def state(table: String): Map[Long, Double] =
    spark.table(table).select("user_id", "v").as[(Long, Double)].collect().toMap

  test("appendJson is idempotent per (topic, epoch): a replayed write overwrites, never duplicates") {
    val conf = freshConf()
    feed(conf, "idem", 1, 1L -> 1.0, 2L -> 2.0)
    feed(conf, "idem", 1, 1L -> 1.0, 2L -> 2.0) // the crash-retry replay
    assert(Topics.readBatchRecords(spark, "idem", conf).count() === 2)
    // a retry that recomputed a DIFFERENT row set replaces the epoch
    feed(conf, "idem", 1, 1L -> 9.0, 2L -> 2.0, 3L -> 3.0)
    val recs = Topics.decodeJson(
      Topics.readBatchRecords(spark, "idem", conf), evSchema)
    assert(recs.select("user_id", "v").as[(Long, Double)].collect().toSet
      === Set((1L, 9.0), (2L, 2.0), (3L, 3.0)))
    // other epochs untouched
    feed(conf, "idem", 2, 4L -> 4.0)
    feed(conf, "idem", 1, 1L -> 1.0)
    val after = Topics.decodeJson(
      Topics.readBatchRecords(spark, "idem", conf), evSchema)
    assert(after.select("user_id", "v").as[(Long, Double)].collect().toSet
      === Set((1L, 1.0), (4L, 4.0)))
  }

  test("runner restart: checkpoint resumes mid-stream, views hydrate, final state equals an uninterrupted run") {
    val conf = freshConf()
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("ev_feed_rst", evSchema)
      r.runScript(script("rst"))
      r
    }
    // ---- phase 1: two epochs, then the process "dies" ----
    val r1 = newRunner()
    feed(conf, "ev_feed_rst", 1, 1L -> 1.0, 2L -> 2.0)
    r1.processAllAvailable()
    feed(conf, "ev_feed_rst", 2, 1L -> 1.5, 3L -> 3.0)
    r1.processAllAvailable()
    assert(state("user_latest_rst") === Map(1L -> 1.5, 2L -> 2.0, 3L -> 3.0))
    r1.stopAll()
    // runner-created targets sink to a SCOPED topic (qualified name,
    // sanitized) — read it back directly to count sunk records
    val targetTopic = "default_env_default_cluster_user_latest_rst"
    val sunkBefore = Topics.readBatchRecords(spark, targetTopic, conf).count()

    // ---- phase 2: a NEW runner on the same topics + checkpoints ----
    spark.catalog.dropTempView("user_latest_rst") // simulate a fresh session's empty view catalog
    val r2 = newRunner()
    // hydration: the pre-crash state is visible BEFORE any new input
    assert(state("user_latest_rst") === Map(1L -> 1.5, 2L -> 2.0, 3L -> 3.0))
    feed(conf, "ev_feed_rst", 3, 2L -> 2.5)
    r2.processAllAvailable()
    assert(state("user_latest_rst") === Map(1L -> 1.5, 2L -> 2.5, 3L -> 3.0))
    // exactly-once sink: every input row sunk exactly once across both
    // processes — the checkpoint kept the restarted source from
    // re-reading epochs 1-2
    val sunk = Topics.readBatchRecords(spark, targetTopic, conf)
    assert(sunk.count() === 5, "restarted runner re-sunk already-committed input")
    assert(sunkBefore === 4)
    r2.stopAll()
  }

  test("restart parity for the regular-join INSERT path (S6 shape): join state hydrates, a post-restart dim revision re-emits pre-crash facts exactly once") {
    val conf = freshConf()
    val custSchema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    val ordSchema = StructType(Seq(
      StructField("order_id", IntegerType), StructField("customer_id", StringType)))
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("cust_src_rj", custSchema)
      r.registerTopicSource("ord_src_rj", ordSchema)
      r.runScript("""
        CREATE TABLE cust_keyed_rj (customer_id STRING, name STRING,
          PRIMARY KEY (customer_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO cust_keyed_rj SELECT id, name FROM cust_src_rj;
        CREATE TABLE ord_enriched_rj (order_id INT, name STRING, __op STRING)
          WITH ('changelog.mode' = 'retract');
        INSERT INTO ord_enriched_rj(order_id, name)
        SELECT o.order_id, c.name FROM ord_src_rj o
        INNER JOIN cust_keyed_rj c ON o.customer_id = c.customer_id""")
      r
    }
    def feedCust(epoch: Long, rows: (String, String)*): Unit =
      Topics.appendJson(rows.toSeq.toDF("id", "name"), "cust_src_rj", conf, Nil, epoch)
    def feedOrd(epoch: Long, rows: (Int, String)*): Unit =
      Topics.appendJson(rows.toSeq.toDF("order_id", "customer_id"), "ord_src_rj", conf, Nil, epoch)
    def net(): List[(Int, String)] = spark.table("ord_enriched_rj")
      .groupBy("order_id", "name")
      .agg(sum(when(col("__op").startsWith("-"), -1L).otherwise(1L)).as("n"))
      .where(col("n") === 1L).select("order_id", "name")
      .as[(Int, String)].collect().toList.sorted

    // ---- phase 1: dims + two orders, then the process "dies" ----
    val r1 = newRunner()
    feedCust(1, "c1" -> "Ann", "c2" -> "Bob")
    r1.processAllAvailable()
    feedOrd(1, 1 -> "c1", 2 -> "c2")
    r1.processAllAvailable()
    r1.stopAll()

    // ---- phase 2: restart; a dim UPDATE and a new order arrive ----
    val r2 = newRunner()
    // hydration: the enriched retract table serves pre-crash rows
    assert(net() === List(1 -> "Ann", 2 -> "Bob"))
    // the revision must re-emit order 1 (its fact lives in the
    // PRE-CRASH join state — this is the JoinState restart recovery:
    // the restarted statement's fact log and dim snapshot resume from
    // the checkpoint dir, not from scratch)
    feedCust(2, "c1" -> "Anna")
    r2.processAllAvailable()
    assert(net() === List(1 -> "Anna", 2 -> "Bob"),
      "a post-restart dim revision must re-enrich facts joined before the crash")
    feedOrd(2, 3 -> "c1")
    r2.processAllAvailable()
    r2.stopAll()

    // order 3 joined the revised dim; order 1 was re-emitted EXACTLY
    // once (the explicit -D/+I pair rides the changelog); order 2
    // untouched by the revision
    assert(net() === List(1 -> "Anna", 2 -> "Bob", 3 -> "Anna"),
      s"regular-join restart parity broken: ${net()}")
    val ops = spark.table("ord_enriched_rj").where(col("order_id") === 1)
      .select("name", "__op").as[(String, String)].collect().toSet
    assert(ops === Set(("Ann", "+I"), ("Ann", "-D"), ("Anna", "+I")))
  }

  test("restart parity for a DOUBLY-DOMINATED join (round 18 multi-node expansion): hydrated brackets re-emit and re-pad exactly") {
    // fact LEFT dim RIGHT band — the dim is the null side of its own
    // node AND of the RIGHT above it, so its deltas route through the
    // MultiNodeSide 2k+1 term set (k=2: inner-flips through both
    // nodes + two pre/post terminal-pad pairs). A restart must hydrate
    // the fact log and BOTH dim snapshots such that a post-crash dim
    // revision nets the same retract/re-emit/re-pad set an
    // uninterrupted run produces.
    val conf = freshConf()
    val dimSchema = StructType(Seq(
      StructField("uid", LongType), StructField("t", StringType)))
    val bandSchema = StructType(Seq(
      StructField("t", StringType), StructField("label", StringType)))
    val factSchema = StructType(Seq(
      StructField("order_id", IntegerType), StructField("uid", LongType)))
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("dim_src_dd", dimSchema)
      r.registerTopicSource("band_src_dd", bandSchema)
      r.registerTopicSource("fact_src_dd", factSchema)
      r.runScript("""
        CREATE TABLE dim_dd (uid BIGINT, t STRING,
          PRIMARY KEY (uid) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO dim_dd SELECT uid, t FROM dim_src_dd;
        CREATE TABLE band_dd (t STRING, label STRING,
          PRIMARY KEY (t) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO band_dd SELECT t, label FROM band_src_dd;
        CREATE TABLE enr_dd (order_id INT, t STRING, label STRING, __op STRING)
          WITH ('changelog.mode' = 'retract');
        INSERT INTO enr_dd (order_id, t, label)
        SELECT f.order_id, c.t, b.label
        FROM fact_src_dd f
        LEFT JOIN dim_dd c ON f.uid = c.uid
        RIGHT JOIN band_dd b ON c.t = b.t""")
      r
    }
    def net(): Set[(Option[Int], Option[String], String)] = spark.table("enr_dd")
      .groupBy("order_id", "t", "label")
      .agg(sum(when(col("__op").startsWith("-"), -1L).otherwise(1L)).as("n"))
      .where(col("n") =!= 0L)
      .select("order_id", "t", "label", "n").collect().map { r =>
        assert(r.getLong(3) === 1L, s"net count outside {0,1}: $r")
        (Option(r.get(0)).map(_.asInstanceOf[Int]),
          Option(r.getString(1)), r.getString(2))
      }.toSet

    // ---- phase 1: bands, dim, one fact — then the process "dies" ----
    val r1 = newRunner()
    Topics.appendJson(Seq(("t1", "B1"), ("t2", "B2")).toDF("t", "label"),
      "band_src_dd", conf, Nil, 1)
    r1.processAllAvailable()
    Topics.appendJson(Seq((1L, "t1")).toDF("uid", "t"), "dim_src_dd", conf, Nil, 1)
    r1.processAllAvailable()
    Topics.appendJson(Seq((1, 1L)).toDF("order_id", "uid"), "fact_src_dd", conf, Nil, 1)
    r1.processAllAvailable()
    r1.stopAll()
    // o1 enriched through t1/B1; t2 has no matching dim -> right pad
    assert(net() === Set((Some(1), Some("t1"), "B1"), (None, None, "B2")))

    // ---- phase 2: restart; revise the doubly-dominated dim ----
    val r2 = newRunner()
    Topics.appendJson(Seq((1L, "t2")).toDF("uid", "t"), "dim_src_dd", conf, Nil, 2)
    r2.processAllAvailable()
    // the revision must (a) retract o1's t1/B1 row and re-emit through
    // t2/B2 — the fact lives in the PRE-CRASH log; (b) retract t2's
    // pad; (c) re-pad t1, now unmatched — all from hydrated state
    assert(net() === Set((Some(1), Some("t2"), "B2"), (None, None, "B1")),
      s"post-restart doubly-dominated revision broke parity: ${net()}")
    // a fact whose uid has NO dim row is invisible under LEFT-then-
    // RIGHT (its null t matches no band) — also after restart
    Topics.appendJson(Seq((2, 9L)).toDF("order_id", "uid"), "fact_src_dd", conf, Nil, 2)
    r2.processAllAvailable()
    assert(net() === Set((Some(1), Some("t2"), "B2"), (None, None, "B1")))
    // its dim arriving upgrades it through t1/B1 and consumes the pad
    Topics.appendJson(Seq((9L, "t1")).toDF("uid", "t"), "dim_src_dd", conf, Nil, 3)
    r2.processAllAvailable()
    assert(net() === Set((Some(1), Some("t2"), "B2"), (Some(2), Some("t1"), "B1")),
      s"post-restart fact upgrade broke parity: ${net()}")
    r2.stopAll()
  }

  test("restart parity for a SELF-JOIN (round 18 per-occurrence sides): both occurrence reads hydrate the one shared fact log") {
    // the two FROM sites of one table share a single state directory
    // (the first occurrence owns the writes); after a restart, a new
    // fact must pair against the PRE-CRASH facts through BOTH sites'
    // cross terms — i.e. each renamed occurrence reads the hydrated
    // shared log, not an empty per-occurrence one
    val conf = freshConf()
    val factSchema = StructType(Seq(
      StructField("order_id", IntegerType), StructField("uid", LongType)))
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("fact_src_sj", factSchema)
      r.runScript("""
        CREATE TABLE pairs_sj (eid1 INT, eid2 INT, __op STRING)
          WITH ('changelog.mode' = 'retract');
        INSERT INTO pairs_sj (eid1, eid2)
        SELECT a.order_id, b.order_id
        FROM fact_src_sj a JOIN fact_src_sj b
          ON a.uid = b.uid AND a.order_id < b.order_id""")
      r
    }
    def net(): Set[(Int, Int)] = spark.table("pairs_sj")
      .groupBy("eid1", "eid2")
      .agg(sum(when(col("__op").startsWith("-"), -1L).otherwise(1L)).as("n"))
      .where(col("n") =!= 0L)
      .select("eid1", "eid2", "n").collect().map { r =>
        assert(r.getLong(2) === 1L, s"net count outside {0,1}: $r")
        (r.getInt(0), r.getInt(1))
      }.toSet

    val r1 = newRunner()
    Topics.appendJson(Seq((1, 7L), (2, 7L)).toDF("order_id", "uid"),
      "fact_src_sj", conf, Nil, 1)
    r1.processAllAvailable()
    r1.stopAll()
    assert(net() === Set((1, 2)))

    val r2 = newRunner()
    Topics.appendJson(Seq((3, 7L), (4, 8L)).toDF("order_id", "uid"),
      "fact_src_sj", conf, Nil, 2)
    r2.processAllAvailable()
    assert(net() === Set((1, 2), (1, 3), (2, 3)),
      s"post-restart self-join must pair new facts against the hydrated shared log: ${net()}")
    Topics.appendJson(Seq((5, 8L)).toDF("order_id", "uid"),
      "fact_src_sj", conf, Nil, 3)
    r2.processAllAvailable()
    assert(net() === Set((1, 2), (1, 3), (2, 3), (4, 5)))
    r2.stopAll()
  }

  test("chained statement DAG across a restart: B streams A's topic, each changelog record flows exactly once") {
    // the reference's statement DAG is topic-chained: statement B's
    // source IS statement A's sink topic. Durability must hold for
    // the CHAIN: after a kill + same-script restart, B must neither
    // re-read A's already-consumed epochs (checkpointed seen-files)
    // nor miss replayed ones (A's epoch overwrite keeps file names
    // stable, so a replay is invisible to B's path-keyed log).
    val conf = freshConf()
    val aTopic = "default_env_default_cluster_chain_a" // runner-scoped topic of chain_a
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("chain_src", StructType(Seq(
        StructField("k", StringType), StructField("v", IntegerType))))
      r.run("""CREATE TABLE chain_a (k STRING, v INT,
               PRIMARY KEY (k) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS""")
      r.run("INSERT INTO chain_a SELECT k, v FROM chain_src")
      // B consumes A's CHANGELOG: the compacted-topic record stream
      // (key = PK json, value = rest) registered as a source
      r.registerTopicSource(aTopic,
        valueSchema = StructType(Seq(StructField("v", IntegerType))),
        keySchema = Some(StructType(Seq(StructField("k", StringType)))))
      r.run("CREATE TABLE chain_b (k STRING, doubled INT)")
      r.run(s"INSERT INTO chain_b SELECT k, v * 2 FROM $aTopic")
      r
    }
    def feed(epoch: Long, rows: (String, Int)*): Unit =
      Topics.appendJson(rows.toSeq.toDF("k", "v"), "chain_src", conf, Nil, epoch)

    val r1 = newRunner()
    feed(1, "a" -> 1, "b" -> 2)
    r1.processAllAvailable()
    assert(spark.table("chain_b").count() === 2)
    r1.stopAll()

    val r2 = newRunner()
    feed(2, "a" -> 3) // upsert revision of a flows as a NEW changelog record
    r2.processAllAvailable()
    r2.stopAll()
    val got = spark.table("chain_b").select("k", "doubled")
      .as[(String, Int)].collect().toList.sorted
    assert(got === List("a" -> 2, "a" -> 6, "b" -> 4),
      s"chained restart must deliver each changelog record exactly once: $got")
  }

  test("merge-on-write aggregate: a replayed batch re-merges the SAME prior state — never double-counts") {
    // the merge path reads its prior state offset-filtered to epochs
    // BEFORE the current batch, so a crash-replayed batch recomputes
    // the identical merged rows and overwrites its epoch; without the
    // filter the replay would merge its delta on top of state that
    // already includes it
    val conf = freshConf()
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("ev_feed_ma", evSchema)
      Seq((1L, "g1"), (2L, "g1"), (3L, "g2")).toDF("uid", "grp")
        .createOrReplaceTempView("ma_rst_dim")
      r.runScript("""
        CREATE TABLE grp_counts_ma (grp STRING, n BIGINT, total DOUBLE,
          PRIMARY KEY (grp) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO grp_counts_ma
        SELECT d.grp, count(*) AS n,
               CAST(sum(CAST(e.v AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM ev_feed_ma e JOIN ma_rst_dim d ON e.user_id = d.uid
        GROUP BY d.grp""")
      r
    }
    val r1 = newRunner()
    feed(conf, "ev_feed_ma", 1, 1L -> 1.0, 3L -> 3.0)
    r1.processAllAvailable()
    feed(conf, "ev_feed_ma", 2, 2L -> 2.0, 1L -> 4.0)
    r1.processAllAvailable()
    def stats() = spark.table("grp_counts_ma")
      .as[(String, Long, Double)].collect().toSet
    val expected = Set(("g1", 3L, 7.0), ("g2", 1L, 3.0))
    assert(stats() === expected)
    r1.stopAll()
    // crash window: drop the newest commit so the batch replays
    val commits = java.nio.file.Files.walk(java.nio.file.Paths.get(conf.root, ".checkpoints"))
      .filter(p => p.getParent != null && p.getParent.getFileName.toString == "commits"
        && !p.getFileName.toString.startsWith("."))
      .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(commits.nonEmpty)
    val (fs, p) = graft.sources.Fs.on(spark, commits.last.toString)
    fs.delete(p, false)
    val r2 = newRunner()
    r2.processAllAvailable() // replays the uncommitted merge batch
    assert(stats() === expected,
      "replayed merge batch must re-merge the same prior state, not double-count")
    // and new input keeps folding on top
    feed(conf, "ev_feed_ma", 3, 3L -> 0.5)
    r2.processAllAvailable()
    assert(stats() === Set(("g1", 3L, 7.0), ("g2", 2L, 3.5)))
    r2.stopAll()
  }

  test("value-set aggregate: a lost-commit replay re-merges BOTH the target and the helper multiset consistently") {
    // the multiset path writes TWO topics per batch (target + helper);
    // both reads are offset-filtered to epochs before the batch, so a
    // replay recomputes identical rows for both and overwrites both
    // epochs — min/max state cannot fork from the visible aggregate
    val conf = freshConf()
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("ev_feed_vs", evSchema)
      // count(DISTINCT v) forces the value-multiset path (min over an
      // external append feed would run natively)
      r.runScript("""
        CREATE TABLE vs_rst (user_id BIGINT, n BIGINT, n_vals BIGINT,
          PRIMARY KEY (user_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO vs_rst
        SELECT user_id, count(*) AS n, count(DISTINCT v) AS n_vals
        FROM ev_feed_vs GROUP BY user_id""")
      r
    }
    val r1 = newRunner()
    feed(conf, "ev_feed_vs", 1, 1L -> 5.0, 1L -> 3.0, 2L -> 7.0)
    r1.processAllAvailable()
    feed(conf, "ev_feed_vs", 2, 1L -> 4.0, 2L -> 1.0)
    r1.processAllAvailable()
    def state() = spark.table("vs_rst")
      .as[(Long, Long, Long)].collect().toSet
    val expected = Set((1L, 3L, 3L), (2L, 2L, 2L))
    assert(state() === expected)
    r1.stopAll()
    val commits = java.nio.file.Files.walk(java.nio.file.Paths.get(conf.root, ".checkpoints"))
      .filter(p => p.getParent != null && p.getParent.getFileName.toString == "commits"
        && !p.getFileName.toString.startsWith("."))
      .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(commits.nonEmpty)
    val (fs, p) = graft.sources.Fs.on(spark, commits.last.toString)
    fs.delete(p, false)
    val r2 = newRunner()
    r2.processAllAvailable() // replays the uncommitted multiset batch
    assert(state() === expected,
      "replayed value-set batch must re-merge both topics, not double-count")
    // the multiset keeps exact-distinct semantics after the replay: a
    // DUPLICATE value must not re-count, a fresh one must
    feed(conf, "ev_feed_vs", 3, 1L -> 3.0, 1L -> 0.5)
    r2.processAllAvailable()
    assert(state() === Set((1L, 5L, 4L), (2L, 2L, 2L)))
    r2.stopAll()
  }

  test("a replayed micro-batch (commit lost in the crash) overwrites its epoch — no duplicates") {
    val conf = freshConf()
    def newRunner(): StreamingStatementRunner = {
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource("ev_feed_rpl", evSchema)
      r.runScript(script("rpl"))
      r
    }
    val r1 = newRunner()
    feed(conf, "ev_feed_rpl", 1, 1L -> 1.0, 2L -> 2.0)
    r1.processAllAvailable()
    feed(conf, "ev_feed_rpl", 2, 1L -> 1.5, 3L -> 3.0)
    r1.processAllAvailable()
    r1.stopAll()
    val topic = "default_env_default_cluster_user_latest_rpl"
    assert(Topics.readBatchRecords(spark, topic, conf).count() === 4)

    // the crash window: the sink ran but the batch COMMIT never landed —
    // drop the newest commit file, forcing Spark to replay that batch
    val commits = java.nio.file.Files.walk(java.nio.file.Paths.get(conf.root, ".checkpoints"))
      .filter(p => p.getParent != null && p.getParent.getFileName.toString == "commits"
        && !p.getFileName.toString.startsWith("."))
      .sorted(java.util.Comparator.comparing[java.nio.file.Path, String](_.toString))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(commits.nonEmpty, "no commit files found — checkpointing is not wired")
    // delete through Hadoop FS: a java.nio delete leaves the local
    // ChecksumFileSystem's .crc sidecar behind, and the replayed
    // commit write then fails on the stale checksum
    val (fs, p) = graft.sources.Fs.on(spark, commits.last.toString)
    fs.delete(p, false)

    val r2 = newRunner()
    r2.processAllAvailable() // replays the uncommitted batch
    assert(Topics.readBatchRecords(spark, topic, conf).count() === 4,
      "replayed batch double-appended instead of overwriting its epoch")
    assert(state("user_latest_rpl") === Map(1L -> 1.5, 2L -> 2.0, 3L -> 3.0))
    r2.stopAll()
  }
}
