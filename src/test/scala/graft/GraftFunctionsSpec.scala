package graft

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(dot === 32.0)
    val norm = spark.sql("SELECT normalize_text('  HeLLo,  WORLD!! 42 ') AS n")
      .as[String].head()
    assert(norm === "hello world 42")
    val sigs = spark.sql(
      "SELECT lsh_signatures(array(1.0D, -2.0D, 0.5D), 3, 8, 4) AS s")
      .as[Seq[Long]].head()
    assert(sigs.length === 4)
    assert(sigs.forall(s => s >= 0 && s < 256))
    val mh = spark.sql(
      "SELECT minhash_signature(array('a b c', 'b c d'), 16) AS s")
      .as[Seq[Long]].head()
    assert(mh.length === 16 && mh.forall(_ != Long.MaxValue))
    val agree = spark.sql(
      "SELECT signature_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS a")
      .as[Int].head()
    assert(agree === 2)
    val fps = spark.sql(
      "SELECT winnow_fingerprints(array('a','b','c','d','e','f'), 4, 8) AS f")
      .as[Seq[Long]].head()
    assert(fps.length === 1) // 3 grams < window — single truncated min
    val mg = spark.sql(
      "SELECT md5_gram_hashes48(array('a','b','a','b'), 2) AS g")
      .as[Seq[Long]].head()
    assert(mg.length === 2) // 'a b','b a' distinct; dupes deduped
    assert(mg.forall(h => h >= 0 && h < (1L << 48)))
    val ce = spark.sql("SELECT char_entropy('aabb') AS c")
      .select($"c.n_chars", $"c.n_unique", $"c.entropy")
      .as[(Int, Int, Double)].head()
    assert(ce === ((4, 2, 1.0)))
  }

  test("signature_agreement: unequal lengths throw; a null position never agrees") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT signature_agreement(array(1L, 2L), array(1L, 2L, 3L)) AS a").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("lengths differ")))
    // two nulls at one position are NOT an agreement (SQL: NULL = NULL
    // is not true) — getLong on a null slot would have yielded 0 == 0
    val agree = spark.sql(
      """SELECT signature_agreement(array(1L, CAST(NULL AS BIGINT), 3L),
                                    array(1L, CAST(NULL AS BIGINT), 4L)) AS a""")
      .as[Int].head()
    assert(agree === 1)
  }

  test("SQL form equals the Column-API form on fixture data") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_gf")
    val viaSql = spark.sql("SELECT doc_id, normalize_text(text) AS n FROM docs_gf")
    val viaApi = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", graft.functions.TextAnalysis.normText($"text").as("n"))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }
}
