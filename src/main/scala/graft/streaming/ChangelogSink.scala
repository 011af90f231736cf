package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Kafka-sink encoding for changelog streams (reference: INSERT INTO a
  * topic-backed table, `terraform/lab-aggregations/main.tf:431,498,563`).
  *
  * Upsert tables write (key, value) records where a DELETE is a key with
  * a null value (tombstone) — exactly the compacted-topic contract
  * (`terraform/lab-joins/main.tf:106,122`). Retract tables write the
  * `__op` tag inside the value instead.
  *
  * `encodeUpsert` produces the (key json, value json|null) frame; an
  * actual Kafka write is `.writeStream.format("kafka")` over it. For
  * tests and the bounded form, `materializeUpsertLog` folds such a frame
  * back into table state (latest value per key, tombstone deletes) —
  * the sink and the source of the round trip.
  */
object ChangelogSink {

  /** Encode rows into the upsert (key,value) frame. Rows where `opCol`
    * (if present) equals "-D" become tombstones. */
  def encodeUpsert(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val hasOp = df.columns.contains("__op")
    val valueCols = df.columns.filterNot(c => keyCols.contains(c) || c == "__op")
    val value = to_json(struct(valueCols.map(col): _*))
    df.select(
      to_json(struct(keyCols.map(col): _*)).as("key"),
      (if (hasOp) when(col("__op") === "-D", lit(null)).otherwise(value)
       else value).as("value"))
  }

  /** Fold an ordered upsert log (key,value) back into final state:
    * latest non-null value per key wins; null value (tombstone) deletes
    * the key. `seqCol` is the log order (Kafka offset analog). */
  def materializeUpsertLog(log: DataFrame, seqCol: String): DataFrame = {
    import graft.operators.ChangelogOps
    val latest = ChangelogOps.latestByKey(log, Seq("key"), Seq(seqCol))
    latest.where(col("value").isNotNull).select("key", "value")
  }
}
