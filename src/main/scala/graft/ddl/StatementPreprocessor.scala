package graft.ddl

import graft.catalog.ChangelogMode

/** Parses the Flink-SQL DDL dialect the reference uses into engine
  * metadata + a vanilla-Spark residue, instead of forking Spark's
  * parser (SURVEY.md §4: "preprocessor strips into TableMeta").
  *
  * Grammar covered = exactly the constructs in the ten reference
  * statements (SURVEY.md §2.1, `terraform/lab-aggregations/main.tf:396,
  * 431,463,498,530,563`; `terraform/lab-joins/main.tf:465,498,531,564`):
  *
  *   CREATE TABLE t (col TYPE, ..., PRIMARY KEY (k, ...) NOT ENFORCED)
  *     [DISTRIBUTED INTO n BUCKETS] [WITH ('k' = 'v', ...)];
  *   INSERT INTO t [(col, ...)] SELECT ...;
  *   ALTER TABLE t MODIFY (`col` TYPE);
  *   ALTER TABLE t MODIFY WATERMARK FOR `col` AS `col` [expr];
  *
  * plus the windowing TVFs the lab-time scope implies (SURVEY.md §2.3):
  * `TABLE(TUMBLE|HOP|CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL ...))`
  * inside any SELECT, lowered to Spark `window()` / explode subqueries
  * by `rewriteWindowTvfs`.
  */
object StatementPreprocessor {

  sealed trait Statement
  final case class CreateTable(name: String,
                               columns: Seq[(String, String)],
                               primaryKey: Seq[String],
                               buckets: Option[Int],
                               options: Map[String, String]) extends Statement {
    def changelogMode: ChangelogMode =
      options.get("changelog.mode") match {
        case Some("retract") => ChangelogMode.Retract
        case Some("append") => ChangelogMode.Append
        case Some("upsert") => ChangelogMode.Upsert
        case _ if primaryKey.nonEmpty => ChangelogMode.Upsert
        case _ => ChangelogMode.Append
      }
  }
  final case class InsertInto(target: String, targetColumns: Seq[String],
                              select: String) extends Statement
  final case class AlterModifyColumn(table: String, column: String,
                                     newType: String) extends Statement
  final case class AlterModifyWatermark(table: String, column: String,
                                        expr: String) extends Statement
  /** `USE CATALOG env` / `USE cluster` — session scoping (reference:
    * `sql.current-catalog`/`sql.current-database` statement properties,
    * `terraform/lab-aggregations/main.tf:398-399`). */
  final case class UseCatalog(name: String) extends Statement
  final case class UseDatabase(name: String) extends Statement
  /** Anything else: vanilla SQL passed straight to Spark. */
  final case class Passthrough(sql: String) extends Statement

  private val CreateHeadRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s*\(""".r
  private val BucketsRe = """(?is)DISTRIBUTED\s+INTO\s+(\d+)\s+BUCKETS?""".r
  private val WithRe = """(?is)WITH\s*\((.*?)\)""".r
  // the select may open with a WITH clause (Flink allows
  // `INSERT INTO t WITH cte AS (...) SELECT ...`) — without the
  // alternative such statements fell through to Passthrough and died
  // as a literal Spark INSERT against a temp view (round 15)
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+`?(\w+)`?\s*(\(([^)]*)\))?\s*((?:SELECT|WITH)\b.*?);?\s*""".r
  // column char class includes `$`: the system column `$rowtime` is a
  // legal ALTER target (watermarks default to it, SURVEY.md §1.4)
  private val AlterColRe =
    """(?is)\s*ALTER\s+TABLE\s+`?(\w+)`?\s+MODIFY\s*\(\s*`?([\w$]+)`?\s+(\w+(?:\(\d+(?:,\s*\d+)?\))?)\s*\)\s*;?\s*""".r
  private val AlterWmRe =
    """(?is)\s*ALTER\s+TABLE\s+`?(\w+)`?\s+MODIFY\s+WATERMARK\s+FOR\s+`?([\w$]+)`?\s+AS\s+(.*?);?\s*""".r
  private val PkRe =
    """(?is)PRIMARY\s+KEY\s*\(([^)]*)\)\s*NOT\s+ENFORCED""".r
  private val UseCatalogRe = """(?is)\s*USE\s+CATALOG\s+`?([\w.-]+)`?\s*;?\s*""".r
  private val UseDbRe = """(?is)\s*USE\s+`?([\w.-]+)`?\s*;?\s*""".r

  def splitScript(script: String): Seq[String] =
    script.split(";").map(_.trim).filter(_.nonEmpty).toSeq

  def parse(stmt: String): Statement = stmt match {
    case s if CreateHeadRe.findPrefixMatchOf(s).isDefined =>
      val head = CreateHeadRe.findPrefixMatchOf(s).get
      val name = head.group(1)
      // balanced-paren scan for the column list: a greedy regex would
      // swallow a trailing WITH (...) clause
      val rest = s.substring(head.end - 1) // starts at '('
      val close = matchingParen(rest)
      val body = rest.substring(1, close)
      val tail = rest.substring(close + 1)
      val pk = PkRe.findFirstMatchIn(body)
        .map(_.group(1).split(",").map(stripQuotes).toSeq)
        .getOrElse(Nil)
      val colBody = PkRe.replaceAllIn(body, "").trim.stripSuffix(",")
      val cols = splitTopLevel(colBody).filter(_.nonEmpty).map { c =>
        val parts = c.trim.split("\\s+", 2)
        (stripQuotes(parts(0)), if (parts.length > 1) parts(1).trim else "STRING")
      }
      val buckets = BucketsRe.findFirstMatchIn(tail).map(_.group(1).toInt)
      val opts = WithRe.findFirstMatchIn(tail).map(m => parseOptions(m.group(1)))
        .getOrElse(Map.empty[String, String])
      CreateTable(name, cols, pk, buckets, opts)
    case InsertRe(target, _, colList, select) =>
      val cols = Option(colList)
        .map(_.split(",").map(stripQuotes).toSeq).getOrElse(Nil)
      InsertInto(target, cols, rewriteWindowTvfs(select.trim))
    case AlterColRe(table, column, newType) =>
      AlterModifyColumn(table, column, newType)
    case AlterWmRe(table, column, expr) =>
      AlterModifyWatermark(table, column, stripQuotes(expr))
    case UseCatalogRe(name) => UseCatalog(name)
    case UseDbRe(name) => UseDatabase(name)
    case other => Passthrough(rewriteWindowTvfs(other.trim))
  }

  // ── windowing TVFs (SURVEY.md §2.4: "lower to Spark window()/
  //    session_window() expressions at translation time") ──
  // Flink:  FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL 'n' UNIT))
  // The rewrite yields a subquery exposing the TVF contract columns
  // `window_start`/`window_end` next to every source column, so the
  // canonical `GROUP BY window_start, window_end` works unchanged.
  private val TumbleRe =
    ("""(?is)TABLE\s*\(\s*TUMBLE\s*\(\s*(?:DATA\s*=>\s*)?TABLE\s+`?(\w+)`?\s*,\s*""" +
      """(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*`?([\w$]+)`?\s*\)\s*,\s*""" +
      """(?:SIZE\s*=>\s*)?INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""").r
  private val HopRe =
    ("""(?is)TABLE\s*\(\s*HOP\s*\(\s*(?:DATA\s*=>\s*)?TABLE\s+`?(\w+)`?\s*,\s*""" +
      """(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*`?([\w$]+)`?\s*\)\s*,\s*""" +
      """(?:SLIDE\s*=>\s*)?INTERVAL\s+'([^']+)'\s+(\w+)\s*,\s*""" +
      """(?:SIZE\s*=>\s*)?INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""").r
  private val CumulateRe =
    ("""(?is)TABLE\s*\(\s*CUMULATE\s*\(\s*(?:DATA\s*=>\s*)?TABLE\s+`?(\w+)`?\s*,\s*""" +
      """(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*`?([\w$]+)`?\s*\)\s*,\s*""" +
      """(?:STEP\s*=>\s*)?INTERVAL\s+'([^']+)'\s+(\w+)\s*,\s*""" +
      """(?:SIZE\s*=>\s*)?INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""").r
  private val SessionRe =
    ("""(?is)TABLE\s*\(\s*SESSION\s*\(\s*(?:DATA\s*=>\s*)?TABLE\s+`?(\w+)`?\s*""" +
      """(?:PARTITION\s+BY\s+(\([^)]*\)|`?[\w$]+`?)\s*)?,\s*""" +
      """(?:TIMECOL\s*=>\s*)?DESCRIPTOR\s*\(\s*`?([\w$]+)`?\s*\)\s*,\s*""" +
      """(?:GAP\s*=>\s*)?INTERVAL\s+'([^']+)'\s+(\w+)\s*\)\s*\)""").r
  private val SessionTvfRe = """(?is)TABLE\s*\(\s*SESSION\s*\(""".r

  private def intervalStr(n: String, unit: String): String =
    s"${n.trim} ${unit.trim.toLowerCase}"

  private def intervalMicros(n: String, unit: String): Long = {
    val base = unit.trim.toLowerCase.stripSuffix("s") match {
      case "millisecond" => 1000L
      case "second" => 1000000L
      case "minute" => 60L * 1000000L
      case "hour" => 3600L * 1000000L
      case "day" => 86400L * 1000000L
      case other => throw new IllegalArgumentException(s"unsupported interval unit: $other")
    }
    n.trim.toLong * base
  }

  /** Rewrite `TABLE(TUMBLE|HOP|CUMULATE(...))` windowing TVFs to Spark
    * subqueries. TUMBLE/HOP lower to the native `window()` expression;
    * CUMULATE (no Spark analog) lowers to the same explode-over-
    * expansions shape as `graft.operators.WindowOps.cumulate`: windows
    * share a start aligned to SIZE and grow by STEP — a stateless
    * row-local expansion, streaming-compatible.
    * `TABLE(SESSION(...))` (Flink 1.19's session TVF, incl. its
    * `PARTITION BY` clause) has no row-local lowering — session merge
    * is inherently an aggregation — so it lowers to the islands-and-
    * gaps window-function subquery: a new-session flag (event-time gap
    * from the previous row ≥ GAP), a running-sum session id, then
    * per-session min/max for the contract columns. `window_end = last
    * rowtime + gap` and "a gap of exactly GAP starts a new session"
    * both match Spark's native `session_window` (asserted equivalent
    * in WindowTvfSpec). Scale note: the window functions partition on
    * the TVF's PARTITION BY keys; WITHOUT keys the running session id
    * is a single ordered partition — same as any engine's keyless
    * session window, use PARTITION BY at scale. */
  def rewriteWindowTvfs(sql: String): String = {
    val t0 = SessionRe.replaceAllIn(sql, m => {
      val (tbl, ts) = (m.group(1), m.group(3))
      val gapUs = intervalMicros(m.group(4), m.group(5))
      val keys = Option(m.group(2)).toSeq.flatMap(
        _.stripPrefix("(").stripSuffix(")").split(',').toSeq)
        .map(k => s"`${stripQuotes(k)}`")
      val over = (if (keys.isEmpty) "" else keys.mkString("PARTITION BY ", ", ", " ")) +
        s"ORDER BY `$ts`"
      val sidPart = (keys :+ "__sid").mkString("PARTITION BY ", ", ", "")
      java.util.regex.Matcher.quoteReplacement(
        s"""(SELECT * EXCEPT(__sid),
           |        timestamp_micros(min(unix_micros(`$ts`)) OVER ($sidPart)) AS window_start,
           |        timestamp_micros(max(unix_micros(`$ts`)) OVER ($sidPart) + ${gapUs}L) AS window_end
           | FROM (SELECT * EXCEPT(__new), sum(__new) OVER ($over) AS __sid
           |       FROM (SELECT *,
           |                    CASE WHEN unix_micros(`$ts`)
           |                           - lag(unix_micros(`$ts`)) OVER ($over) < ${gapUs}L
           |                         THEN 0 ELSE 1 END AS __new
           |             FROM $tbl)))""".stripMargin)
    })
    if (SessionTvfRe.findFirstIn(t0).isDefined)
      throw new IllegalArgumentException(
        "unsupported TABLE(SESSION(...)) form — supported: TABLE(SESSION(TABLE t " +
          "[PARTITION BY (k, ...)], DESCRIPTOR(ts), INTERVAL 'n' UNIT)); or write " +
          "GROUP BY session_window(`ts`, '<gap>') natively")
    val t1 = TumbleRe.replaceAllIn(t0, m => {
      val (tbl, ts, n, u) = (m.group(1), m.group(2), m.group(3), m.group(4))
      java.util.regex.Matcher.quoteReplacement(
        s"""(SELECT * EXCEPT(__w), __w.start AS window_start, __w.end AS window_end
           | FROM (SELECT *, window(`$ts`, '${intervalStr(n, u)}') AS __w FROM $tbl))""".stripMargin)
    })
    val t2 = HopRe.replaceAllIn(t1, m => {
      val (tbl, ts) = (m.group(1), m.group(2))
      val slide = intervalStr(m.group(3), m.group(4))
      val size = intervalStr(m.group(5), m.group(6))
      java.util.regex.Matcher.quoteReplacement(
        s"""(SELECT * EXCEPT(__w), __w.start AS window_start, __w.end AS window_end
           | FROM (SELECT *, window(`$ts`, '$size', '$slide') AS __w FROM $tbl))""".stripMargin)
    })
    CumulateRe.replaceAllIn(t2, m => {
      val (tbl, ts) = (m.group(1), m.group(2))
      val stepUs = intervalMicros(m.group(3), m.group(4))
      val sizeUs = intervalMicros(m.group(5), m.group(6))
      require(sizeUs % stepUs == 0, "CUMULATE: step must divide size")
      val steps = sizeUs / stepUs
      java.util.regex.Matcher.quoteReplacement(
        s"""(SELECT * EXCEPT(__ws_us, __we_us),
           |        timestamp_micros(__ws_us) AS window_start,
           |        timestamp_micros(__we_us) AS window_end
           | FROM (SELECT * EXCEPT(__k), __ws_us + __k * ${stepUs}L AS __we_us
           |       FROM (SELECT *, (unix_micros(`$ts`) div ${sizeUs}L) * ${sizeUs}L AS __ws_us,
           |                    explode(sequence(1, $steps)) AS __k
           |             FROM $tbl))
           | WHERE unix_micros(`$ts`) < __we_us)""".stripMargin)
    })
  }

  /** Index of the ')' matching the '(' at position 0 of `s`. */
  private def matchingParen(s: String): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  private def stripQuotes(s: String): String = s.trim.stripPrefix("`").stripSuffix("`")

  /** Parse the delay of `WATERMARK FOR c AS <expr>` (both runners call
    * this): the bare-column form is zero delay; Flink's
    * bounded-out-of-orderness form `c - INTERVAL 'n' UNIT` parses to
    * Spark's `withWatermark` delay string. Anything else is rejected
    * LOUDLY at parse time — storing the raw expression would only
    * surface later as an opaque plan-time error inside a running
    * stream (VERDICT r12 "what's wrong" item 1). */
  def parseWatermarkDelay(column: String, expr: String): String = {
    val c = stripQuotes(column)
    val e = expr.replace("`", "").trim
    if (e.equalsIgnoreCase(c)) "0 seconds"
    else {
      val re = ("(?i)^" + java.util.regex.Pattern.quote(c) +
        """\s*-\s*INTERVAL\s*'(\d+)'\s*(SECOND|MINUTE|HOUR|DAY)S?\s*$""").r
      e match {
        case re(n, unit) => s"$n ${unit.toLowerCase(java.util.Locale.ROOT)}s"
        case _ => throw new IllegalArgumentException(
          s"WATERMARK FOR $column AS $expr: unsupported watermark expression — " +
            "use the bare column (zero delay) or " +
            "col - INTERVAL 'n' SECOND|MINUTE|HOUR|DAY (bounded delay)")
      }
    }
  }

  /** Split a column-definition body on top-level commas (ROW<...> and
    * DECIMAL(p,s) nest commas). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('(' | '<') => depth += 1; cur.append(c)
      case c @ (')' | '>') => depth -= 1; cur.append(c)
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim)
  }

  private def parseOptions(s: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap

  /** Flink type name → Spark SQL type name (SURVEY.md §1.3). Recursive:
    * `ROW<f t, ...>` (the ORDERS quickstart `address` struct, reference
    * `terraform/lab-tables/main.tf:174`) → `STRUCT<f: t, ...>`;
    * `ARRAY<t>` / `MAP<k, v>` / `MULTISET<t>` map element-wise. A
    * trailing `NOT NULL` is stripped (Spark DDL nullability is carried
    * by the schema, not the type name). */
  def toSparkType(flinkType: String): String = {
    val t = flinkType.trim.replaceAll("(?i)\\s+NOT\\s+NULL\\s*$", "")
    val up = t.toUpperCase
    def innerOf(s: String): String = s.substring(s.indexOf('<') + 1, s.lastIndexOf('>'))
    if (up.startsWith("ROW<") || up.startsWith("ROW ")) {
      val fields = splitTopLevel(innerOf(t)).filter(_.nonEmpty).map { f =>
        val parts = f.trim.split("\\s+", 2)
        val ft = if (parts.length > 1) parts(1) else "STRING"
        s"`${stripQuotes(parts(0))}`: ${toSparkType(ft)}"
      }
      s"STRUCT<${fields.mkString(", ")}>"
    } else if (up.startsWith("ARRAY<") || up.startsWith("MULTISET<")) {
      s"ARRAY<${toSparkType(innerOf(t))}>"
    } else if (up.startsWith("MAP<")) {
      val kv = splitTopLevel(innerOf(t))
      s"MAP<${toSparkType(kv(0))}, ${toSparkType(kv(1))}>"
    } else up match {
      case "STRING" | "VARCHAR" => "STRING"
      case "INT" | "INTEGER" => "INT"
      case "BIGINT" => "BIGINT"
      case "DOUBLE" => "DOUBLE"
      case "FLOAT" => "FLOAT"
      case "BOOLEAN" => "BOOLEAN"
      case "BYTES" => "BINARY"
      case s if s.startsWith("TIMESTAMP") => "TIMESTAMP"
      case s if s.startsWith("DECIMAL") => s
      case s if s.startsWith("CHAR") || s.startsWith("VARCHAR") => "STRING"
      case other => other
    }
  }
}
