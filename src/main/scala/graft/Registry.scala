package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named Spark query over a scale-factor
  * dir, optionally paired with equivalent DuckDB SQL (the correctness
  * oracle) and optionally flagged as a bench headline query.
  *
  * Oracle-parity rules (driver hashes values after sorting columns by name
  * and sorting rows):
  *   - alias every computed column identically on both sides;
  *   - keep floating-point out of aggregation order dependence: money columns
  *     are exact 2-decimal doubles, so `round(x*100)` as BIGINT cents makes
  *     sums exact and engine-independent; divide back to double at the end;
  *   - give every LIMIT/top-k query a total order (unique tiebreak column).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {
  /** All registered capabilities, in SURVEY §2 order (pure + deterministic
    * ⇒ built once).
    */
  lazy val all: Seq[Q] =
    ops.CoreQueries.defs ++
      ops.ScalarFnQueries.defs ++
      ops.FlowQueries.defs ++
      ops.StreamQueries.defs ++
      ext.DedupQueries.defs ++
      ext.SimilarityQueries.defs ++
      ext.TextQueries.defs ++
      ext.MultimodalQueries.defs ++
      ext.PipelineQueries.defs ++
      ext.DecontamQueries.defs ++
      ext.LayoutQueries.defs ++
      ext.SeriesQueries.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val headlines: Seq[Q] = all.filter(_.headline)
}
