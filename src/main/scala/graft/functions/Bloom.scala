package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.BinaryType

/** Column-API access to Spark's internal bloom-filter expressions — the
  * exact machinery `InjectRuntimeFilter` uses for runtime shuffle pruning
  * (`BloomFilterAggregate` builds the filter as a real distributed
  * aggregate with partial/merge; `BloomFilterMightContain` probes it
  * inside whole-stage codegen). Spark only wires these up for its own
  * join-runtime-filter rule; exposing them as Columns lets a pipeline
  * build a *semantic* bloom prefilter — e.g. "train n-grams that might
  * collide with the eval set" (x7d) — while keeping both sides codegen'd.
  *
  * Values are probed as LongType (feed `xxhash64(...)` on BOTH build and
  * probe sides); the serialized filter is a single binary blob, so
  * broadcasting it costs ~1.2 bytes/item at 1% FPP versus tens of bytes
  * per distinct key for a broadcast-join build side.
  */
object Bloom {

  /** Aggregate a LongType column into a serialized bloom filter (one
    * BinaryType value; null when the input is empty). `estItems`/`numBits`
    * size the filter — at production scale derive `estItems` from an
    * `approx_count_distinct` pre-pass rather than a constant.
    */
  def bloomAgg(c: Column, estItems: Long, numBits: Long): Column =
    Shim.column(
      new BloomFilterAggregate(Shim.expression(c), Literal(estItems), Literal(numBits))
        .toAggregateExpression())

  /** Codegen membership probe of a serialized filter against a LongType
    * column. No false negatives; false-positive rate set by the build
    * sizing, so follow with an exact confirm when exactness matters.
    *
    * Fixture-scale/test overload — the blob rides the plan as a Literal.
    * Production paths should use the [[mightContainSubquery]] overload so
    * a multi-MB filter never lands in the plan text (VERDICT r07).
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    Shim.column(BloomFilterMightContain(Literal(bloom, BinaryType), Shim.expression(c)))

  /** Probe a filter BUILT BY THE PLAN ITSELF: `bloomDf` must be a 1-row /
    * 1-column aggregate (typically `df.agg(bloomAgg(...))`), attached as an
    * uncorrelated scalar subquery — the exact shape Spark's own
    * `InjectRuntimeFilter` emits. The blob never touches the driver-side
    * query-building code and never appears as a plan literal: the subquery
    * runs once, its single binary result is wired into the probe's codegen
    * references, and the task binary ships to executors via Spark's
    * torrent broadcast. A null blob (empty build input) makes the probe
    * NULL, i.e. a `where` on it drops every row — the right semantics for
    * "nothing to collide with".
    */
  def mightContainSubquery(bloomDf: org.apache.spark.sql.DataFrame, c: Column): Column =
    Shim.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomDf.queryExecution.analyzed),
      Shim.expression(c)))
}
