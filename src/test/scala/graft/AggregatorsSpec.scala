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

  test("TopKAgg buffer algebra: bounded, ordered, merge-order independent") {
    val agg = new Aggregators.TopKAgg(3)
    def entries(b: Array[Long]): Seq[(Long, Long)] =
      agg.finish(b).map(e => (e.metric, e.id)).toSeq
    // reduce keeps (metric DESC, id ASC) and caps at k
    var b = agg.zero
    Seq((5L, 1L), (9L, 2L), (5L, 0L), (1L, 9L), (9L, 1L), (7L, 4L))
      .foreach { case (m, i) => b = agg.reduce(b, Aggregators.TopEntry(m, i)) }
    assert(entries(b) == Seq((9L, 1L), (9L, 2L), (7L, 4L)))
    // merge of arbitrary splits agrees with the sequential fold
    val all = (0 until 50).map(i => ((i * 37) % 11L, i.toLong))
    val sequential = all.foldLeft(agg.zero) { case (acc, (m, i)) =>
      agg.reduce(acc, Aggregators.TopEntry(m, i)) }
    for (split <- Seq(1, 7, 25, 49)) {
      val (l, r) = all.splitAt(split)
      val bl = l.foldLeft(agg.zero) { case (acc, (m, i)) =>
        agg.reduce(acc, Aggregators.TopEntry(m, i)) }
      val br = r.foldLeft(agg.zero) { case (acc, (m, i)) =>
        agg.reduce(acc, Aggregators.TopEntry(m, i)) }
      assert(entries(agg.merge(bl, br)) == entries(sequential), s"split $split")
      assert(entries(agg.merge(br, bl)) == entries(sequential), s"swap $split")
    }
    // fewer rows than k: all kept, still ordered
    val small = agg.reduce(agg.reduce(agg.zero, Aggregators.TopEntry(1, 5)),
      Aggregators.TopEntry(3, 2))
    assert(entries(small) == Seq((3L, 2L), (1L, 5L)))
  }

  test("TopKAgg distributed result equals the window formulation") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7, (i * 131) % 97L, i.toLong))
      .toDF("g", "m", "id").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(Aggregators.top_k(5)(col("m"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("col.metric").as("m"), col("col.id").as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("m").desc, col("id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5).select("g", "rnk", "m", "id")
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }
}
