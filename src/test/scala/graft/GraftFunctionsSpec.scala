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
