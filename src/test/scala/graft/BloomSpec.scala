package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom

/** The bloom Column bridge (functions/Bloom.scala) — the filter built by
  * BloomFilterAggregate and probed by BloomFilterMightContain must show
  * the sketch contract x7d relies on: zero false negatives, a bounded
  * false-positive rate at the chosen sizing, and a null blob on an empty
  * build side (x7d's "no eval split" branch).
  */
class BloomSpec extends SparkSpec {

  test("no false negatives; false positives bounded by sizing") {
    val built = spark.range(0L, 1000L).toDF("v")
    val bytes = built
      .agg(Bloom.bloomAgg(xxhash64(col("v")), 10000L, 1L << 17))
      .head.getAs[Array[Byte]](0)
    assert(bytes != null && bytes.length > 0)
    val probed = spark.range(0L, 2000L).toDF("v")
      .select(col("v"), Bloom.mightContain(bytes, xxhash64(col("v"))).as("m"))
      .collect()
    val falseNeg = probed.filter(r => r.getLong(0) < 1000L && !r.getBoolean(1))
    assert(falseNeg.isEmpty, s"bloom lost ${falseNeg.length} inserted values")
    // 2^17 bits for 1k items ⇒ fpp ≪ 1%; allow 5% before calling it broken
    val falsePos = probed.count(r => r.getLong(0) >= 1000L && r.getBoolean(1))
    assert(falsePos < 50, s"$falsePos false positives out of 1000 probes")
  }

  test("empty build side evaluates to a null blob") {
    val bytes = spark.range(0L, 10L).toDF("v").where(col("v") < 0L)
      .agg(Bloom.bloomAgg(xxhash64(col("v")), 100L, 1L << 10))
      .head.getAs[Array[Byte]](0)
    assert(bytes == null)
  }

  test("subquery probe: filter built by the plan, no binary plan literal") {
    val bloomDf = spark.range(0L, 1000L).toDF("v")
      .agg(Bloom.bloomAgg(xxhash64(col("v")), 10000L, 1L << 17).as("bf"))
    val probed = spark.range(0L, 2000L).toDF("v")
      .where(Bloom.mightContainSubquery(bloomDf, xxhash64(col("v"))))
    val hits = probed.collect().map(_.getLong(0))
    // zero false negatives: every inserted value survives the filter
    assert((0L until 1000L).forall(hits.contains), "subquery bloom lost inserted values")
    assert(hits.count(_ >= 1000L) < 50, "false-positive rate broken under subquery probe")
    // the serialized filter must NOT ride the outer plan as a literal —
    // only as a scalar subquery (the InjectRuntimeFilter shape)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val binaryLits = probed.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l @ Literal(v, BinaryType) if v != null => l
    })
    assert(binaryLits.isEmpty, "bloom blob leaked into the plan as a Literal")
    assert(probed.queryExecution.optimizedPlan.toString.contains("scalar-subquery"),
      "probe lost its scalar-subquery attachment")
  }

  test("subquery probe over an EMPTY build side drops every row") {
    val bloomDf = spark.range(0L, 10L).toDF("v").where(col("v") < 0L)
      .agg(Bloom.bloomAgg(xxhash64(col("v")), 100L, 1L << 10).as("bf"))
    val n = spark.range(0L, 100L).toDF("v")
      .where(Bloom.mightContainSubquery(bloomDf, xxhash64(col("v"))))
      .count()
    assert(n == 0L, "null blob must null the probe and drop all rows")
  }
}
