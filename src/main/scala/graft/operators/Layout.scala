package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.LayoutExpressions

/** Multi-dimensional data LAYOUT for scan pruning at scale.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the
  * dominant lever on the scan is FILE SKIPPING: Parquet footers carry
  * per-file min/max for every column, and the reader prunes files whose
  * range cannot match a predicate. Which files get pruned is decided
  * entirely by how rows were CLUSTERED when written. A single-column
  * `ORDER BY x` layout leaves every other dimension's per-file range
  * degenerate (each x-run spans all of y), so predicates on y prune
  * nothing. The Z-order (Morton) curve interleaves the bits of two
  * bucketed dimensions into one key ([[graft.expressions.ZOrderKey]]);
  * any contiguous key range is then a small axis-aligned rectangle in
  * (x, y), keeping BOTH dimensions' file stats tight.
  *
  * The write path at scale is `withZOrderKey(...)` followed by
  * `repartitionByRange($"__z")` + `sortWithinPartitions($"__z")` — a
  * standard range-shuffle write, no new machinery. What needs a
  * first-class operator is the AUDIT: [[zOrderTileStats]] groups rows
  * by a fixed Z-prefix (a "tile" ≈ what one written file would hold)
  * and reports each tile's extent in both source dimensions — the
  * number every layout decision is judged by. Tile assignment is a
  * pure function of row content (no sort, no row_number), so the audit
  * is one combinable aggregation riding the scan, and its result is
  * independent of partitioning — the property that makes it
  * DuckDB-oracle-checkable.
  */
object Layout {

  /** `bits`-bit Z-order key of two non-negative bigint dimension
    * columns (callers bucket/clamp beforehand; values are masked to
    * `bits` bits). */
  def zOrderKey(x: Column, y: Column, bits: Int): Column =
    LayoutExpressions.zOrderKey(x, y, bits)

  /** Adds the Z-order key as `__z` — compose with
    * `repartitionByRange`/`sortWithinPartitions` on the write path. */
  def withZOrderKey(df: DataFrame, x: Column, y: Column, bits: Int): DataFrame =
    df.withColumn("__z", zOrderKey(x, y, bits))

  /** Per-tile clustering audit of the Z-order layout of `events` over
    * (user bucket, hour bucket):
    *   ux = user_id & (2^bits − 1)         — user locality dimension
    *   tx = (epoch_us(ts) div 3600·10⁶) & (2^bits − 1) — hour index
    *   tile = zorder(ux, tx) >> tileShift  — one tile ≈ one file's rows
    * Output: tile id, row count, and min/max of BOTH dimensions — the
    * per-file column stats a Parquet footer would carry. For a
    * Z-ordered layout each tile's `ux`/`tx` spans are ~2^(tileShift/2)
    * wide; for a one-dimensional layout one of them degenerates to the
    * full domain. One hash aggregation, no sort, no window: the audit
    * itself never pays the layout's cost.
    */
  def zOrderTileStats(events: DataFrame, userCol: String, tsCol: String,
                      bits: Int = 10, tileShift: Int = 8): DataFrame = {
    require(tileShift >= 1 && tileShift < 2 * bits,
      s"tileShift must be in [1, ${2 * bits}), got $tileShift")
    val mask = (1L << bits) - 1
    val ux = col(userCol).bitwiseAND(lit(mask))
    // epoch hours are non-negative for any post-1970 timestamp, so the
    // div-then-mask is floor-exact and engine-portable (CLAUDE.md:
    // keep intDiv operands non-negative)
    val tx = graft.expressions.HashExpressions
      .intDiv(unix_micros(col(tsCol)), lit(3600000000L)).bitwiseAND(lit(mask))
    events
      .select(zOrderKey(ux, tx, bits).as("z"), ux.as("ux"), tx.as("tx"))
      .groupBy(graft.expressions.HashExpressions
        .intDiv(col("z"), lit(1L << tileShift)).as("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min("ux").as("ux_min"), max("ux").as("ux_max"),
        min("tx").as("tx_min"), max("tx").as("tx_max"))
  }
}
