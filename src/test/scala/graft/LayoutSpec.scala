package graft

import org.apache.spark.sql.functions._

import graft.expressions.LayoutExpressions
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-model reference for the codegen kernel. */
  private def refInterleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
    }

  test("ZOrderKey matches the bit-model reference and masks to `bits`") {
    val cases = Seq((0L, 0L), (3L, 1L), (1023L, 0L), (0L, 1023L),
      (1023L, 1023L), (512L, 511L), (0x7FFFL, 0x1L))
    val got = cases.toDF("x", "y")
      .select(LayoutExpressions.zOrderKey($"x", $"y", 10).as("z"))
      .as[Long].collect()
    val want = cases.map { case (x, y) => refInterleave(x & 1023, y & 1023, 10) }
    assert(got.toSeq === want)
    // spot-check the canonical tiny example: x=0b11, y=0b01 → 0b0111
    assert(refInterleave(3, 1, 2) === 7L)
  }

  test("Z-order tiles bound BOTH dimensions (the file-skipping property a 1-D sort lacks)") {
    // 64 users × 64 hours, one event each — a uniform grid. With
    // tileShift = 8 a tile fixes all but the low 4 bits of each
    // dimension, so every tile's extent is ≤ 15 in ux AND tx. A
    // time-ordered layout's "tiles" would span all 64 users.
    val events = (0 until 64).flatMap { u =>
      (0 until 64).map { h => (u.toLong, h * 3600L * 1000000L) }
    }.toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts"))
    val tiles = Layout.zOrderTileStats(events, "user_id", "ts",
      bits = 10, tileShift = 8).collect()
    assert(tiles.nonEmpty)
    tiles.foreach { r =>
      val uxSpan = r.getAs[Long]("ux_max") - r.getAs[Long]("ux_min")
      val txSpan = r.getAs[Long]("tx_max") - r.getAs[Long]("tx_min")
      assert(uxSpan <= 15 && txSpan <= 15,
        s"tile ${r.getAs[Long]("tile")} spans ux=$uxSpan tx=$txSpan — locality lost")
    }
    // the grid has 64×64 rows in 16×16-capable tiles → every full tile
    // holds 256 rows; total row count must be preserved
    assert(tiles.map(_.getAs[Long]("n_rows")).sum === 64L * 64L)
  }
}
