package graft

import graft.functions.PiiScrub
import org.apache.spark.sql.functions._

/** Planted-PII oracle for the scrub step — the fixture corpus carries
  * no PII (by construction), so redaction correctness is asserted here
  * on synthetic rows with known expected outputs. */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(rows: Seq[String]) =
    rows.toDF("text")
      .select(col("text"), PiiScrub.piiCounts(col("text")).as("c"),
        PiiScrub.redact(col("text")).as("redacted"))
      .select(col("text"), col("c.n_email"), col("c.n_ipv4"), col("c.n_ssn"),
        col("c.n_phone"), col("redacted"))
      .as[(String, Int, Int, Int, Int, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("each pattern detects and redacts its planted PII exactly") {
    val got = scrub(Seq(
      "contact me at jane.doe+spam@example.co.uk for details",
      "server at 192.168.1.254 timed out",
      "ssn is 123-45-6789 on file",
      "call 555-123-4567 or +1 (555) 987-6543 today",
      "no pii in this sentence at all"))
    assert(got("contact me at jane.doe+spam@example.co.uk for details") ===
      ((1, 0, 0, 0, "contact me at <EMAIL> for details")))
    assert(got("server at 192.168.1.254 timed out") ===
      ((0, 1, 0, 0, "server at <IP> timed out")))
    assert(got("ssn is 123-45-6789 on file") ===
      ((0, 0, 1, 0, "ssn is <SSN> on file")))
    assert(got("call 555-123-4567 or +1 (555) 987-6543 today") ===
      ((0, 0, 0, 2, "call <PHONE> or <PHONE> today")))
    assert(got("no pii in this sentence at all") ===
      ((0, 0, 0, 0, "no pii in this sentence at all")))
  }

  test("redaction order: IP wins over the looser phone shape; placeholders never re-match") {
    val got = scrub(Seq(
      "ping 10.0.255.123 now",          // phone-shaped digit run inside an IP
      "mail root@10.0.0.1 please"))     // numeric host: NOT an email (TLD must be alpha)
    // the IP is redacted as <IP>, not chewed into a <PHONE>
    assert(got("ping 10.0.255.123 now")._5 === "ping <IP> now")
    // the email pattern requires an alphabetic TLD, so a raw-IP "email"
    // is left for the IP pattern — the host still gets scrubbed
    assert(got("mail root@10.0.0.1 please") === ((0, 1, 0, 0, "mail root@<IP> please")))
  }

  test("multiple PII kinds in one document all redact") {
    val text = "reach admin@site.org or 555-123-4567; host 8.8.8.8; ssn 987-65-4320"
    val got = scrub(Seq(text))(text)
    assert(got === ((1, 1, 1, 1,
      "reach <EMAIL> or <PHONE>; host <IP>; ssn <SSN>")))
  }

  test("plain digit words and hyphenated dates are NOT flagged") {
    val got = scrub(Seq(
      "the year 2023-01-15 release shipped 1234567 units",
      "version 1.2.3 of the 10.4 toolchain"))
    got.values.foreach { case (e, i, s, p, _) =>
      assert((e, i, s, p) === ((0, 0, 0, 0)))
    }
    // and the text is untouched
    got.foreach { case (in, (_, _, _, _, red)) => assert(red === in) }
  }

  test("piiDensityBySource: per-source totals and any-match rate in exact micro") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob@example.com and alice@example.com today", "crawlA"),
      (2L, "nothing sensitive here at all", "crawlA"),
      (3L, "clean text without identifiers", "crawlB")
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.Curation.piiDensityBySource(docs, "text")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("crawlA") === (("crawlA", 2L, 2L, 0L, 0L, 0L, 500000L)))
    assert(got("crawlB") === (("crawlB", 1L, 0L, 0L, 0L, 0L, 0L)))
  }
}
