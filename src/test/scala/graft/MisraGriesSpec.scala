package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** The x4s heavy-hitter sketch's algebra and its one load-bearing
  * guarantee: the candidate set is a SUPERSET of every item with true
  * frequency > n/(capacity+1), under sequential reduce AND under any
  * merge tree over partitioned inputs (the map-side-combine shapes Spark
  * actually plans). The query-level exactness (sketch + recount ≡ exact
  * groupBy) rides on this superset contract alone — a false positive
  * costs one recount row, a false negative would lose a heavy hitter.
  */
class MisraGriesSpec extends SparkSpec {

  private def heavyTruth(items: Seq[String], cap: Int): Set[String] = {
    val n = items.size.toLong
    items.groupBy(identity).collect {
      case (k, v) if v.size.toLong * (cap + 1) > n => k
    }.toSet
  }

  private def sketchSeq(agg: Aggregators.MisraGriesAgg,
      items: Seq[String]): Map[String, Long] =
    items.foldLeft(agg.zero)(agg.reduce)

  test("reduce: superset guarantee and bounded buffer on a skewed stream") {
    val cap = 8
    val agg = new Aggregators.MisraGriesAgg(cap)
    // 3 heavy items drowned in a wide tail of singletons
    val rnd = new scala.util.Random(7)
    val items = rnd.shuffle(
      Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma") ++
        (0 until 600).map(i => s"tail$i"))
    val buf = sketchSeq(agg, items)
    assert(buf.size <= cap)
    val cands = agg.finish(buf).keySet
    val truth = heavyTruth(items, cap)
    assert(truth.nonEmpty && truth.subsetOf(cands),
      s"missing heavy hitters: ${truth -- cands}")
  }

  test("merge: superset guarantee holds under any partitioning and order") {
    val cap = 6
    val agg = new Aggregators.MisraGriesAgg(cap)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val nKeys = 2 + rnd.nextInt(40)
      val items = rnd.shuffle((0 until 800).map { _ =>
        // zipf-ish: low ids much more frequent
        val k = math.min(nKeys - 1, (math.abs(rnd.nextGaussian()) * nKeys / 4).toInt)
        s"k$k"
      })
      val truth = heavyTruth(items, cap)
      // arbitrary partitioning into 1..6 chunks, merged in random order
      val parts = items.grouped(1 + rnd.nextInt(items.size / (1 + rnd.nextInt(6)) + 1)).toSeq
      val bufs = rnd.shuffle(parts.map(p => sketchSeq(agg, p)))
      val merged = bufs.reduce(agg.merge)
      assert(merged.size <= cap, s"trial $trial: buffer over capacity")
      val cands = agg.finish(merged).keySet
      assert(truth.subsetOf(cands),
        s"trial $trial: missing ${truth -- cands} (truth $truth, cands $cands)")
    }
  }

  test("merge error bound: counts under-estimate by at most n/(capacity+1)") {
    val cap = 10
    val agg = new Aggregators.MisraGriesAgg(cap)
    val rnd = new scala.util.Random(3)
    val items = rnd.shuffle(
      (0 until 20).flatMap(k => Seq.fill(1 + k * k)(s"k$k")))
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (l, r) = items.splitAt(items.size / 3)
    val merged = agg.merge(sketchSeq(agg, l), sketchSeq(agg, r))
    merged.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k over-estimated")
      assert(exact(k) - est <= n / (cap + 1), s"$k error beyond bound")
    }
  }

  test("q52t sketch fold: batch replay is deterministic; torn generations are invisible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mgsketch").toString
    val sk = s"$dir/sketch"
    def latest: Map[String, Long] = {
      val p = ops.StreamQueries.latestSketchGen(spark, sk, Long.MaxValue)
        .getOrElse(fail("no sketch generation"))
      spark.read.parquet(p).as[(String, Long)].collect().toMap
    }
    val b0 = Seq.fill(20)("alpha beta gamma alpha beta").toDF("text")
    val b1 = Seq.fill(20)("beta gamma delta beta gamma").toDF("text")
    ops.StreamQueries.heavyHitterSketchWriter(sk)(b0, 0L)
    val afterB0 = latest
    ops.StreamQueries.heavyHitterSketchWriter(sk)(b1, 1L)
    val afterB1 = latest
    assert(afterB1 != afterB0)
    // whole-batch replay of batch 1: the fold rebuilds from the newest
    // generation STRICTLY below 1 (= batch 0), so the result is identical
    ops.StreamQueries.heavyHitterSketchWriter(sk)(b1, 1L)
    assert(latest == afterB1)
    // a torn generation (no _SUCCESS) is invisible to the reader and to
    // the next fold's strictly-below lookup
    val torn = new java.io.File(s"$sk/batch=2")
    assert(torn.mkdirs())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$sk/batch=2/part-junk"),
      Array[Byte](1, 2, 3))
    assert(latest == afterB1)
    assert(ops.StreamQueries.latestSketchGen(spark, sk, 3L)
      .exists(_.endsWith("batch=1")))
  }

  test("distributed sketch + exact recount equals the exact heavy-hitter set") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val items = rnd.shuffle(
      Seq.fill(500)("hot") ++ Seq.fill(260)("warm") ++
        (0 until 1000).map(i => s"cold$i"))
    val df = items.toDF("gram").repartition(8)
    val n = items.size.toLong
    val cap = 16 // 1/theta = 10 < cap+1: superset guaranteed
    val cand = df.agg(Aggregators.misra_gries(cap)(col("gram")).as("c"))
      .select(explode(map_keys(col("c"))).as("gram"))
    val got = df.join(broadcast(cand), Seq("gram"), "left_semi")
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10 >= n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * 10 >= n).toMap
    assert(got == want)
  }
}
