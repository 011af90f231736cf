package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog/dynamic-table operators: the upsert ("latest row per key")
  * and retract materializations the reference's keyed tables encode.
  *
  * Reference semantics: `PRIMARY KEY (...) NOT ENFORCED` upsert tables
  * (`terraform/lab-aggregations/main.tf:396,463`), compacted versioned
  * topics (`terraform/lab-joins/main.tf:106,122`), and
  * `'changelog.mode' = 'retract'` (`terraform/lab-aggregations/main.tf:530`).
  *
  * Scale notes: latest/first-by-key use `max_by`/`min_by` aggregation —
  * partial (map-side) combinable, ONE shuffle on the key, no per-partition
  * full sort (unlike a `row_number` window, which must sort every row).
  * At 100 TB this is the difference between a combine-then-shuffle of one
  * row per key per mapper and shuffling the entire input.
  */
object ChangelogOps {

  private def pick(df: DataFrame, keys: Seq[String], orderBy: Seq[String],
                   agg: (Column, Column) => Column): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val picked = agg(struct(payload.map(col): _*), struct(orderBy.map(col): _*))
    df.groupBy(keys.map(col): _*)
      .agg(picked.as("__row"))
      .select(keys.map(col) ++ payload.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Upsert materialization: latest row per key, "latest" = max of the
    * (lexicographic) orderBy tuple. Equivalent to Flink's compacted /
    * PK-upsert table view; oracle form is `row_number() ... desc = 1`.
    * orderBy must be a total order (include a unique id as tiebreak).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[String]): DataFrame =
    pick(df, keys, orderBy, max_by)

  /** Dedup keeping the FIRST row per key (Flink dedup `ROW_NUMBER()=1`
    * ascending; reference §2.3 dedup row). */
  def firstByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[String]): DataFrame =
    pick(df, keys, orderBy, min_by)

  /** Materialize a retract changelog (`'changelog.mode'='retract'`,
    * reference `terraform/lab-aggregations/main.tf:530`): rows carry an
    * op column (+1 insert / -1 retract); the materialized state per key
    * is the net count and net sum of each value column. Keys whose net
    * count is zero have been fully retracted and are dropped.
    * Single map-combinable aggregation — one shuffle on the key.
    */
  def materializeRetract(df: DataFrame, opCol: String, keys: Seq[String],
                         valueCols: Seq[String]): DataFrame = {
    val aggs = sum(col(opCol)).cast("long").as("net_count") +:
      valueCols.map(c =>
        sum(col(opCol) * col(c).cast("decimal(18,4)")).cast("double").as(s"net_$c"))
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("net_count") =!= 0)
  }
}
