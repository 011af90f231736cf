package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("normText lowercases, strips punctuation, collapses whitespace") {
    val got = Seq("  Hello,   WORLD!! 42 ").toDF("t")
      .select(TextAnalysis.normText($"t")).as[String].head()
    assert(got === "hello world 42")
  }

  test("normText non-ASCII fallback matches Spark's lower+regex chain") {
    val inputs = Seq("İstanbul city", "héllo wörld", "ASCII only 42", "ümlaut ÜBER straße")
    val df = inputs.toDF("t")
    val regexChain = trim(regexp_replace(
      regexp_replace(lower($"t"), "[^a-z0-9 ]", " "), " +", " "))
    val rows = df.select(TextAnalysis.normText($"t"), regexChain)
      .as[(String, String)].collect()
    rows.foreach { case (fast, ref) => assert(fast === ref) }
  }

  test("fingerprint is stable and normalization-invariant") {
    val fps = Seq("Hello  World", "hello world", "HELLO, WORLD").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[String].collect()
    assert(fps.distinct.length === 1)
  }

  test("tokenCount and stopwordCount") {
    val df = Seq("the cat sat on the mat").toDF("t")
    assert(df.select(TextAnalysis.tokenCount($"t")).as[Int].head() === 6)
    assert(df.select(TextAnalysis.stopwordCount($"t")).as[Int].head() === 2)
  }

  test("qualityScore is in [0,1] and higher for longer stopword-bearing prose") {
    val scores = Seq(
      ("good", "the data is in the table and it is a good set of rows to read now"),
      ("bad", "zzz qq")
    ).toDF("k", "t").select($"k", TextAnalysis.qualityScore($"t"))
      .as[(String, Double)].collect().toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores("good") > scores("bad"))
  }

  test("langId picks the language with most marker hits, und when none") {
    val got = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze ist nicht da", "de"),
      ("el perro y la casa es un lugar", "es"),
      ("xyzzy qwerty", "und")
    ).toDF("t", "expected")
    val rows = got.select(TextAnalysis.langId($"t"), $"expected").as[(String, String)].collect()
    rows.foreach { case (pred, exp) => assert(pred === exp) }
  }

  test("charStats: hand-computed entropies, empty input, non-ASCII path") {
    val cases = Seq(
      ("aabb", (4, 2, 1.0)),       // two symbols, equal mass -> 1 bit
      ("abab", (4, 2, 1.0)),       // order-independent
      ("aaaa", (4, 1, 0.0)),       // degenerate -> 0 bits
      ("abcd", (4, 4, 2.0)),       // uniform over 4 -> 2 bits
      ("", (0, 0, 0.0)),           // empty defined as 0
      ("ééaa", (4, 2, 1.0)),       // TreeMap (non-ASCII) path
      ("éa", (2, 2, 1.0)))
    val got = cases.map(_._1).toDF("t")
      .select($"t", TextAnalysis.charStats($"t").as("s"))
      .select($"t", $"s.n_chars", $"s.n_unique", round($"s.entropy", 9))
      .as[(String, Int, Int, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    cases.foreach { case (in, exp) => assert(got(in) === exp, s"input '$in'") }
  }

  test("gopherRules: each rule trips on its crafted violation") {
    val longOk = (Seq("the", "a") ++ (1 to 60).map(i => "tok" + i)).mkString(" ")
    val cases = Seq(
      // (text, expected (r_words, r_mean_len, r_stop, r_alpha, r_rep, keep))
      (longOk, (true, true, true, true, true, true)),
      ("the a few words only", (false, true, true, true, true, false)),  // too short
      ((Seq("the", "a") ++ (1 to 60).map(_ => "supercalifragilistic")).mkString(" "),
        (true, false, true, true, false, false)),  // mean len > 10 AND one repeated gram
      ((1 to 60).map(i => "tok" + i).mkString(" "),
        (true, true, false, true, true, false)),   // no stopwords
      ((Seq("the", "a") ++ (1 to 60).map(i => i.toString + "00")).mkString(" "),
        (true, true, true, false, true, false)))   // digit tokens: alpha frac ~ 0.03
    val got = cases.map(_._1).toDF("t")
      .select($"t", TextAnalysis.gopherRules($"t", minWords = 20).as("r"))
      .select($"t", $"r.r_words", $"r.r_mean_len", $"r.r_stop", $"r.r_alpha",
        $"r.r_rep", $"r.keep")
      .as[(String, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    cases.foreach { case (in, exp) =>
      assert(got(in) === exp, s"input: ${in.take(60)}")
    }
  }

  test("hashedClassifier: exact integer weight units, portable md5 bucket, additive sum") {
    def run(t: String): (Int, Long, Double, Boolean) =
      Seq(t).toDF("t").select(TextAnalysis.hashedClassifier($"t").as("c"))
        .select($"c.n_tokens", $"c.w_sum", $"c.logit", $"c.label")
        .as[(Int, Long, Double, Boolean)].head()
    // w("the") = ((first32(md5('the')) % 4096) % 1001) − 500 = −322,
    // verified against the DuckDB hex-parse (the cross-engine contract)
    assert(run("the") === ((1, -322L, -0.644, false)))
    // the sum is exact integer units → strictly additive per occurrence
    val (_, wThe, _, _) = run("the")
    val (_, wFox, _, _) = run("fox")
    val (n3, w3, logit3, _) = run("the the fox")
    assert(n3 === 3 && w3 === 2 * wThe + wFox)
    // exact integer half-up replay (the oracle's formula)
    assert(logit3 === (((w3 + 1500L) * 2000000L + 1500L) / 3000L - 1000000L) / 1e6)
    // regression: the sf0.1 tie case −2094/32000 = −0.0654375 must
    // round half-UP on the exact rational (−0.065437), not on the
    // double's shortest repr (Spark round() gave −0.065438)
    val tie = ((-2094L + 500L * 64L) * 2000000L + 500L * 64L) / (1000L * 64L) - 1000000L
    assert(tie === -65437L)
    // label is the sign of the exact sum, not of the rounded logit
    val (_, wSumPos, _, labelPos) = run("fox fox fox")
    assert(labelPos === (wSumPos >= 0))
  }
}
