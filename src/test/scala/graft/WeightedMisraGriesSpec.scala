package graft

import graft.functions.Aggregators
import graft.functions.Aggregators.WeightedKeyIn

/** q52u's weighted heavy-hitter sketch: the trim rule (subtract the
  * (capacity+1)-th largest from all, keep positives) must preserve the
  * superset guarantee for WEIGHT — every key with true weight
  * > W/(capacity+1) survives — under sequential reduce and under any
  * merge tree, and must degenerate EXACTLY to the unweighted sketch on
  * all-1 weights (the decrement algebra changes with weights — VERDICT
  * r14 #3 called the property out as worth its own test).
  */
class WeightedMisraGriesSpec extends SparkSpec {

  private def heavyTruth(items: Seq[(String, Long)], cap: Int): Set[String] = {
    val w = items.map(_._2).sum
    items.groupBy(_._1).collect {
      case (k, v) if v.map(_._2).sum * (cap + 1) > w => k
    }.toSet
  }

  private def sketchSeq(agg: Aggregators.WeightedMisraGriesAgg,
      items: Seq[(String, Long)]): Map[String, Long] =
    items.foldLeft(agg.zero)((b, a) => agg.reduce(b, WeightedKeyIn(a._1, a._2)))

  test("reduce: weight-superset guarantee and bounded buffer on skewed bytes") {
    val cap = 8
    val agg = new Aggregators.WeightedMisraGriesAgg(cap)
    val rnd = new scala.util.Random(7)
    // 3 heavy talkers by BYTES (few flows, large weights) drowned in a
    // wide tail of many small flows — the flows regime where count-based
    // MG would rank the tail above the talkers
    val items = rnd.shuffle(
      Seq.fill(20)(("talker-a", 50000L)) ++
        Seq.fill(10)(("talker-b", 40000L)) ++
        Seq.fill(8)(("talker-c", 60000L)) ++
        (0 until 2000).map(i => (s"tail$i", 100L + i % 900)))
    val buf = sketchSeq(agg, items)
    assert(buf.size <= cap)
    val truth = heavyTruth(items, cap)
    assert(truth == Set("talker-a", "talker-b", "talker-c"))
    assert(truth.subsetOf(agg.finish(buf).keySet),
      s"missing heavy talkers: ${truth -- buf.keySet}")
  }

  test("merge: weight-superset guarantee under any partitioning and order") {
    val cap = 6
    val agg = new Aggregators.WeightedMisraGriesAgg(cap)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val nKeys = 2 + rnd.nextInt(40)
      val items = rnd.shuffle((0 until 800).map { _ =>
        val k = rnd.nextInt(nKeys)
        // zipf-ish: low key ids get large weights
        (s"k$k", (1L + rnd.nextInt(100)) * (if (k < 3) 50L else 1L))
      })
      // random partition count and a random binary merge tree
      val parts = items.grouped(1 + rnd.nextInt(200)).map(sketchSeq(agg, _)).toSeq
      val merged = parts.reduceLeft(agg.merge)
      assert(merged.size <= cap, s"trial $trial: buffer over capacity")
      val truth = heavyTruth(items, cap)
      assert(truth.subsetOf(merged.keySet),
        s"trial $trial: missing ${truth -- merged.keySet}")
      // under-estimate bound: sketch weight within W/(cap+1) of truth
      val exact = items.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val w = items.map(_._2).sum
      merged.foreach { case (k, v) =>
        assert(v <= exact(k), s"trial $trial: over-estimate on $k")
        assert(exact(k) - v <= w / (cap + 1) + 1,
          s"trial $trial: under-estimate bound broken on $k")
      }
    }
  }

  test("all-1 weights degenerate exactly to the unweighted sketch") {
    val cap = 5
    val wAgg = new Aggregators.WeightedMisraGriesAgg(cap)
    val uAgg = new Aggregators.MisraGriesAgg(cap)
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 20) {
      val items = (0 until 500).map(_ => s"k${rnd.nextInt(2 + rnd.nextInt(30))}")
      val weighted = items.foldLeft(wAgg.zero)((b, k) =>
        wAgg.reduce(b, WeightedKeyIn(k, 1L)))
      val unweighted = items.foldLeft(uAgg.zero)(uAgg.reduce)
      assert(weighted == unweighted, s"trial $trial diverged")
    }
  }

  test("non-positive weights carry no evidence") {
    val agg = new Aggregators.WeightedMisraGriesAgg(4)
    val b = sketchSeq(agg, Seq(("a", 10L), ("b", 0L), ("c", -5L)))
    assert(b == Map("a" -> 10L))
  }

  test("distributed udaf fold matches the sequential sketch's guarantee") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val items = rnd.shuffle(
      Seq.fill(30)(("heavy", 10000L)) ++
        (0 until 1000).map(i => (s"t$i", 50L + i % 100)))
    val df = items.toDF("k", "w").repartition(8)
    val m = df.agg(Aggregators.weighted_misra_gries(8)($"k", $"w").as("sk"))
      .head().getMap[String, Long](0).toMap
    assert(m.size <= 8 && m.contains("heavy"))
  }
}
