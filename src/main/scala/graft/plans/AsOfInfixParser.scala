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
  *    comparison.
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

  // <left> [LEFT] ASOF JOIN <right> MATCH_CONDITION (<lt> >=|<= <rt>)
  //   ON <lk> = <rk> [TIEBREAK <tie>]
  private val Clause = (
    """(?i)([\w.]+)\s+(LEFT\s+)?ASOF\s+JOIN\s+([\w.]+)\s+""" +
      """MATCH_CONDITION\s*\(\s*([\w.]+)\s*(>=|<=)\s*([\w.]+)\s*\)\s+""" +
      """ON\s+([\w.]+)\s*=\s*([\w.]+)(\s+TIEBREAK\s+([\w.]+))?""").r

  /** Rewrite every infix ASOF JOIN clause to its `asof_join(...)` call;
    * text without the keywords is returned untouched.
    */
  def rewrite(sql: String): String = {
    if (!sql.toUpperCase.contains("ASOF")) return sql
    Clause.replaceAllIn(sql, m => {
      val leftOuter = m.group(2) != null
      val direction = if (m.group(5) == ">=") AsOfJoin.Backward else AsOfJoin.Forward
      val tie = Option(m.group(10)).getOrElse(m.group(6))
      scala.util.matching.Regex.quoteReplacement(
        s"asof_join('${m.group(1)}', '${m.group(3)}', " +
          s"'${m.group(7)}', '${m.group(8)}', " +
          s"'${m.group(4)}', '${m.group(6)}', '$tie', $leftOuter, '$direction')")
    })
  }
}
