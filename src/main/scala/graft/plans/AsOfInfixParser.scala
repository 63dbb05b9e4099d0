package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Infix `ASOF JOIN` SQL syntax (VERDICT r07 #9), lowered onto the
  * existing [[AsOfJoin]] operator by rewriting the join clause to the
  * already-injected `asof_join(...)` table function before delegating to
  * Spark's parser. The accepted shape is Snowflake's:
  *
  * {{{
  * SELECT ... FROM errors [LEFT] ASOF JOIN purchases
  *   MATCH_CONDITION (errors.err_ts >= purchases.pur_ts)
  *   ON errors.u = purchases.pu
  *   [TIEBREAK purchases.pur_id]
  * ...
  * }}}
  *
  *  - `MATCH_CONDITION (lt >= rt)` — most recent right row at-or-before
  *    the left time (backward); `<=` selects the earliest at-or-after
  *    (forward). The LEFT side's time must be written on the LEFT of the
  *    comparison. A bounded form `(lt >= rt AND lt - rt <= K)` (resp.
  *    `(lt <= rt AND rt - lt <= K)`) lowers K to the operator's
  *    tolerance — matches farther than K in the time column's unit
  *    become no-match (r9).
  *  - `ON lk = rk` — single equi-key (the operator's key contract).
  *  - `TIEBREAK col` (extension, optional) — deterministic tie column;
  *    defaults to the right time column.
  *  - `LEFT ASOF JOIN` keeps unmatched left rows (null right columns).
  *
  * Table and column names may be qualified (`view.col`); both sides of
  * the rewritten function resolve them exactly as [[AsOfSql]] documents.
  * SQL without the `ASOF JOIN` keywords passes through byte-identical
  * (single fast containment check), so the wrapper costs nothing on the
  * hot path.
  */
class AsOfInfixParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(AsOfInfixParser.rewrite(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(AsOfInfixParser.rewrite(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object AsOfInfixParser {

  private val Shape =
    "supported shape: <left> [LEFT] ASOF JOIN <right> MATCH_CONDITION " +
      "(lt >= rt [AND lt - rt <= K] | lt <= rt [AND rt - lt <= K]) " +
      "ON lk = rk [TIEBREAK tie]"

  // <left> [LEFT] ASOF JOIN <right> MATCH_CONDITION (<cond>)
  //   ON <lk> = <rk> [TIEBREAK <tie>]  — <cond> parsed separately below
  private val Clause = (
    """(?i)([\w.]+)\s+(LEFT\s+)?ASOF\s+JOIN\s+([\w.]+)\s+""" +
      """MATCH_CONDITION\s*\(([^()]*)\)\s*""" +
      """ON\s+([\w.]+)\s*=\s*([\w.]+)(\s+TIEBREAK\s+([\w.]+))?""").r

  private val SimpleCond =
    """(?i)\A\s*([\w.]+)\s*(>=|<=)\s*([\w.]+)\s*\z""".r
  // bounded match (VERDICT r08 #5): `lt >= rt AND lt - rt <= K` lowers to
  // the operator's tolerance (backward); `lt <= rt AND rt - lt <= K` is
  // the forward form. K is in the time column's native unit.
  private val BoundedCond = ("""(?i)\A\s*([\w.]+)\s*(>=|<=)\s*([\w.]+)""" +
    """\s+AND\s+([\w.]+)\s*-\s*([\w.]+)\s*<=\s*(\d+)\s*\z""").r

  private val AsOfKeywords = """(?i)ASOF\s+JOIN""".r
  private val TrailingAnd = """(?i)\A\s*AND\b""".r

  /** Rewrite every infix ASOF JOIN clause to its `asof_join(...)` call;
    * text without the keywords is returned untouched. Matching runs on a
    * masked shadow of the SQL (string literals, quoted identifiers and
    * comments blanked out, offsets preserved — ADVICE r08), so a clause
    * spelled inside a literal or comment is never rewritten, and an
    * `ASOF JOIN` that survives outside every recognized clause — or a
    * compound `ON ... AND ...` whose tail would otherwise leak into the
    * delegate parser as a confusing fragment — fails fast with the
    * supported shape instead.
    */
  def rewrite(sql: String): String = {
    if (!sql.toUpperCase.contains("ASOF")) return sql
    val shadow = masked(sql)
    val matches = Clause.findAllMatchIn(shadow).toList
    AsOfKeywords.findAllMatchIn(shadow).foreach { k =>
      if (!matches.exists(m => k.start >= m.start && k.end <= m.end))
        throw new IllegalArgumentException(
          s"asof: malformed infix ASOF JOIN clause; $Shape")
    }
    if (matches.isEmpty) return sql
    val out = new StringBuilder
    var last = 0
    matches.foreach { m =>
      if (TrailingAnd.findFirstIn(shadow.substring(m.end)).isDefined)
        throw new IllegalArgumentException(
          "asof: compound ON conditions are not supported " +
            s"(single equi-key only); $Shape")
      out.append(sql.substring(last, m.start)).append(lower(m))
      last = m.end
    }
    out.append(sql.substring(last)).toString
  }

  private def lower(m: scala.util.matching.Regex.Match): String = {
    val (lt, op, rt, tol) = m.group(4) match {
      case SimpleCond(a, o, b) => (a, o, b, None)
      case BoundedCond(a, o, b, x, y, k) =>
        // the bound must subtract the SAME two columns in match order:
        // lt - rt under >=, rt - lt under <= — anything else is not a
        // tolerance and must not silently lower to one
        val wantX = if (o == ">=") a else b
        val wantY = if (o == ">=") b else a
        if (!x.equalsIgnoreCase(wantX) || !y.equalsIgnoreCase(wantY))
          throw new IllegalArgumentException(
            s"asof: tolerance bound must be $wantX - $wantY <= K; $Shape")
        (a, o, b, Some(k))
      case other => throw new IllegalArgumentException(
        s"asof: unsupported MATCH_CONDITION ($other); $Shape")
    }
    val leftOuter = m.group(2) != null
    val direction = if (op == ">=") AsOfJoin.Backward else AsOfJoin.Forward
    val tie = Option(m.group(8)).getOrElse(rt)
    s"asof_join('${m.group(1)}', '${m.group(3)}', " +
      s"'${m.group(5)}', '${m.group(6)}', " +
      s"'$lt', '$rt', '$tie', $leftOuter, '$direction'" +
      tol.map(k => s", $k").getOrElse("") + ")"
  }

  /** Blank out single/double-quoted literals, backtick identifiers, `--`
    * line comments and bracketed comments, preserving length so match
    * offsets transfer to the original text. Doubled quotes and backslash
    * escapes inside literals are honored.
    */
  private def masked(sql: String): String = {
    val out = sql.toCharArray
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        out(i) = ' '; i += 1
        var open = true
        while (i < n && open) {
          val d = sql.charAt(i)
          if (d == '\\' && c != '`' && i + 1 < n) { out(i) = ' '; out(i + 1) = ' '; i += 2 }
          else if (d == c && i + 1 < n && sql.charAt(i + 1) == c) {
            out(i) = ' '; out(i + 1) = ' '; i += 2 // doubled = escaped
          } else {
            out(i) = ' '; i += 1
            if (d == c) open = false
          }
        }
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') { out(i) = ' '; i += 1 }
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        out(i) = ' '; out(i + 1) = ' '; i += 2
        var open = true
        while (i < n && open) {
          if (sql.charAt(i) == '*' && i + 1 < n && sql.charAt(i + 1) == '/') {
            out(i) = ' '; out(i + 1) = ' '; i += 2; open = false
          } else { out(i) = ' '; i += 1 }
        }
      } else i += 1
    }
    new String(out)
  }
}
