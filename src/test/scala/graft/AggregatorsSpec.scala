package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators

class AggregatorsSpec extends SparkSpec {

  test("BitOrAgg ORs per group and splits into partials") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 8L), ("b", 16L))
      .toDF("k", "flags").repartition(4)
    val out = df.groupBy("k").agg(Aggregators.bit_or_agg(col("flags")).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 11L, "b" -> 16L))
  }

  test("WeightedAvgAgg computes exact weighted mean; empty weight -> NaN") {
    import spark.implicits._
    val df = Seq((1L, 1L), (3L, 3L)).toDF("v", "w")
    val r = df.agg(Aggregators.weighted_avg(col("v"), col("w"))).head.getDouble(0)
    assert(r == 2.5) // (1*1 + 3*3) / 4
    val z = Seq((5L, 0L)).toDF("v", "w")
      .agg(Aggregators.weighted_avg(col("v"), col("w"))).head.getDouble(0)
    assert(z.isNaN)
  }
}
