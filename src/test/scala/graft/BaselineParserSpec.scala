package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.parseBaseline]] against the r17 contamination class
  * (VERDICT r17): a baseline row is EXACTLY a two-cell
  * `| qNNN | float |` line. Adjudication/forensics tables — whose
  * first numeric column is a REPS floor or a full-suite reading, not
  * a baseline — must yield NO rows. dev/test_baseline_parser.py pins
  * the python twin (dev/bench_gate.py) to the same semantics. */
class BaselineParserSpec extends AnyFunSuite {

  test("adjudication/forensics tables yield no baseline rows") {
    val forensics =
      """| query | r14 full-suite | REPS=6 floor | vs baseline | verdict |
        ||---|---|---|---|---|
        || q106_hard_negatives | 0.53 | 0.378 | 1.05x | noise |
        || q192_lsh_rebucket | 3.20 | 3.465 | 1.35x | watch (+0.9 s abs) |
        |
        || query | old row | new floor | note |
        ||---|---|---|---|
        || q175_dup_pagerank | 5.15 | 2.97 | |
        |""".stripMargin
    assert(Bench.parseBaseline(forensics) === Map.empty,
      "multi-cell rows must be unparseable as baselines")
  }

  test("two-cell rows parse, later rows win, padding variants accepted, extra cells rejected") {
    val src =
      """| query | sec (cold) |
        ||---|---|
        || q01_pricing_agg | 0.29 |
        || q91_numeric_profile | 0.62 |
        |
        |re-baseline (later rows win):
        |
        || q91_numeric_profile | 0.55 |
        |""".stripMargin
    assert(Bench.parseBaseline(src)
      === Map("q01_pricing_agg" -> 0.29, "q91_numeric_profile" -> 0.55))
    assert(Bench.parseBaseline("| q01_x | 1.5 |  ") === Map("q01_x" -> 1.5))
    assert(Bench.parseBaseline("|q01_x|1.5|") === Map("q01_x" -> 1.5))
    assert(Bench.parseBaseline("| q01_x | 1.5 | noise |") === Map.empty)
    assert(Bench.parseBaseline("| q01_x | 1.5 s |") === Map.empty)
  }

  test("the committed BASELINE.md parses to the restored intended rows (VERDICT r17 item 1)") {
    val f = new java.io.File("BASELINE.md")
    assume(f.isFile, "run from the repo root")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val rows = try Bench.parseBaseline(src.mkString) finally src.close()
    assert(rows.size >= 246, s"expected >= 246 baselined queries, got ${rows.size}")
    // spot-pin both contamination directions: a floor that tightened
    // the row and a full-suite reading that loosened it
    assert(rows("q91_numeric_profile") === 0.62)
    assert(rows("q175_dup_pagerank") === 2.97)
    assert(rows("q192_lsh_rebucket") === 2.57)
    assert(rows("q216_stream_burst_window") === 3.86)
    assert(rows("q08_window_hop") === 0.27)
  }
}
