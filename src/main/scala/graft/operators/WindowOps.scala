package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Window shapes beyond Spark's built-in tumble/hop/session: the
  * CUMULATE TVF from the reference's dialect (lab-time scope, SURVEY.md
  * §2.3) — windows share a start aligned to `maxSize` and grow by
  * `step` until they cover `maxSize`:
  *
  *   [T0, T0+step), [T0, T0+2·step), ..., [T0, T0+maxSize)
  *
  * Lowered to an explode over the (maxSize/step) expansions each row
  * belongs to + a normal groupBy — stateless row-local expansion, one
  * shuffle on (window_start, window_end), streaming-compatible when a
  * watermark is present on `tsCol`.
  */
object WindowOps {

  /** Adds `window_start_us` / `window_end_us` (epoch micros) columns,
    * one output row per cumulate expansion containing the row. */
  def cumulate(df: DataFrame, tsCol: String, maxSizeMicros: Long,
               stepMicros: Long): DataFrame = {
    require(maxSizeMicros % stepMicros == 0, "step must divide maxSize")
    val steps = (maxSizeMicros / stepMicros).toInt
    val tsUs: Column = unix_micros(col(tsCol))
    val ws = expr(s"unix_micros($tsCol) div ${maxSizeMicros}L") * maxSizeMicros
    df.withColumn("window_start_us", ws)
      .withColumn("__k", explode(sequence(lit(1), lit(steps))))
      .withColumn("window_end_us",
        col("window_start_us") + col("__k").cast("long") * stepMicros)
      .where(tsUs < col("window_end_us"))
      .drop("__k")
  }
}
