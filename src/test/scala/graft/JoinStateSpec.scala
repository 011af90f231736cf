package graft

import graft.streaming.JoinState
import org.apache.spark.sql.functions._

/** Unit behavior of the regular join's per-statement state store
  * ([[graft.streaming.JoinState]]): multiset explode safety, append-log
  * read/write discipline, and log compaction (round 17). */
class JoinStateSpec extends SparkSpec {
  import spark.implicits._

  test("explodeCnt: non-positive counts contribute no rows (a pending retraction is not content)") {
    // ADVICE r16: sequence(1, cnt) with cnt < 1 is a DESCENDING
    // sequence — a persisted negative would fabricate |cnt|+2 phantom
    // rows; the explode must drop non-positive counts instead
    val folded = Seq(("a", 2L), ("b", 1L), ("c", 0L), ("d", -1L), ("e", -5L))
      .toDF("__payload", "__cnt")
    val rows = JoinState.explodeCnt(folded).as[String].collect().toList.sorted
    assert(rows === List("a", "a", "b"),
      s"negative/zero counts must explode to nothing, got $rows")
  }

  test("foldSnapshot keeps a transient negative so the late add still nets to zero") {
    val prior = Seq(("a", -1L)).toDF("__payload", "__cnt")
    val add = Seq(("a", 1)).toDF("__payload", "__sign")
    val out = JoinState.foldSnapshot(prior, add)
      .as[(String, Long)].collect().toMap
    assert(out === Map.empty, "the pending retraction must cancel the add")
  }
}
