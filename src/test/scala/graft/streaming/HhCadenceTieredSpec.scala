package graft.streaming

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The r18 TIERED entrant catch-up (VERDICT r17 #4): with `tierDir` set,
  * the cadence writer's catch-up folds a generational summary store
  * (q52y's [[graft.ext.SimilarityQueries.maintainPqStore]] with an
  * additive gram fold) instead of the raw `rowsDir/batch=*` glob. These
  * specs pin the three claims the 30× churn gate then measures at scale:
  *
  *   1. EXACTNESS — under forced churn + pruning (the
  *      HhCadencePropertySpec geometry: capacity 16 ≪ vocabulary, θinv
  *      10), every firing's artifact equals the exact sketch-free
  *      θ-recount at that watermark, AND equals the UNTIERED writer's
  *      artifact on the same batches (the tier changes where counts are
  *      read from, never what they are). Enough firings run that the
  *      store's fanout-4 cascade fires a level merge — the additive
  *      re-aggregation on merge is on the tested path.
  *   2. LEDGER SEMANTICS — tiered firings record `histBatchesRead == 0`
  *      (no raw-history scan, the point of the tier) and a measured
  *      `catchupBytes >= 0` whenever entrants caught up.
  *   3. ORPHAN SWEEP — a fragment left by a crash BETWEEN a firing's
  *      summary write and its cum-gen write (its window is re-covered by
  *      the next firing's wider window) is deleted before the next
  *      summary lands, so the store never double-counts. Simulated by
  *      planting a poison fragment at an id strictly inside
  *      (prevGenId, nextFiringId).
  */
class HhCadenceTieredSpec extends SparkSpec {

  import graft.ops.StreamQueries.heavyHitterSketchWriter

  private def seededBatches(seed: Long, nBatches: Int): Seq[Seq[(Long, String)]] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 20).map(i => s"w$i")
    (0 until nBatches).map { b =>
      (0 until 8).map { i =>
        val words =
          if (rnd.nextInt(3) == 0) Seq("alpha", "beta", "gamma")
          else Seq.fill(5)(vocab(rnd.nextInt(vocab.size)))
        ((b * 8 + i).toLong, words.mkString(" "))
      }
    }
  }

  private def exactAt(batches: Seq[Seq[(Long, String)]],
      id: Int): Set[(String, Long, Long)] = {
    import spark.implicits._
    val soFar = batches.take(id + 1).flatten.toDF("doc_id", "text")
    val grams = graft.ext.TextQueries.heavyHitterGrams(soFar)
      .groupBy("gram").agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val total = grams.map(_._2).sum
    grams.filter(_._2 * 10L >= total)
      .map { case (g, c) => (g, c, c * 1000000L / total) }.toSet
  }

  test("tiered firing artifacts are watermark-exact and equal the untiered writer's") {
    import spark.implicits._
    // 12 batches / 6 firings: four pre-cycle L0 gens exist by the 5th
    // firing, so the fanout-4 cascade merge (and its additive gram
    // re-aggregation) runs inside the test
    val batches = seededBatches(20260817L, 12)
    val dirT = s"${graft.Tmp.root}/hhtier-a"
    val dirU = s"${graft.Tmp.root}/hhtier-b"
    Seq(dirT, dirU).foreach(d => FileUtils.deleteQuietly(new java.io.File(d)))
    val ledger = new graft.ops.StreamQueries.CumLedger
    val tiered = heavyHitterSketchWriter(s"$dirT/sketch", s"$dirT/rows",
      s"$dirT/hh", 2, s"$dirT/cum", ledger, capacity = 16, thetaInv = 10L,
      tierDir = s"$dirT/tier")
    val untiered = heavyHitterSketchWriter(s"$dirU/sketch", s"$dirU/rows",
      s"$dirU/hh", 2, s"$dirU/cum", null, capacity = 16, thetaInv = 10L)
    batches.zipWithIndex.foreach { case (docs, id) =>
      tiered(docs.toDF("doc_id", "text"), id.toLong)
      untiered(docs.toDF("doc_id", "text"), id.toLong)
    }
    val firingIds = Seq(1, 3, 5, 7, 9, 11)
    firingIds.foreach { id =>
      val got = spark.read.parquet(s"$dirT/hh/batch=$id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val other = spark.read.parquet(s"$dirU/hh/batch=$id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == exactAt(batches, id), s"watermark $id not exact")
      assert(got == other, s"watermark $id: tiered != untiered")
    }
    // the cascade fired: some live generation sits above level 0
    val gens = graft.ext.SimilarityQueries.completeGens(spark, s"$dirT/tier")
    assert(gens.exists(_.level >= 1),
      s"no level>=1 gen after 6 maintenance cycles: $gens")
    // ledger semantics on the tiered path
    val firings = ledger.rows.toSeq.filter(_.fired)
    assert(firings.forall(_.histBatchesRead == 0L))
    assert(firings.filter(_.entrants > 0).forall(_.catchupBytes >= 0L))
    assert(ledger.rows.toSeq.filterNot(_.fired).forall(_.catchupBytes == -1L))
  }

  test("the weighted writer's tierDir matches its untiered artifacts and the exact recount") {
    import spark.implicits._
    import graft.ops.StreamQueries.{topTalkerSketchWriter, FlowHhThetaInv}
    // HhRecountCadenceSpec's skewed-talker corpus, long enough (12
    // batches / 6 firings) that the store's fanout-4 cascade merges —
    // the additive (sum_bytes, n_flows) double-sum re-aggregation runs
    // on the tested path
    def flowBatch(ids: Range) = ids.map(i =>
      (if (i % 3 == 0) "10.0.0.1" else s"10.1.0.${i % 250}",
        if (i % 3 == 0) 50000L else 100L + i)).toDF("src_addr", "bytes")
    val dirT = s"${graft.Tmp.root}/talkertier-a"
    val dirU = s"${graft.Tmp.root}/talkertier-b"
    Seq(dirT, dirU).foreach(d => FileUtils.deleteQuietly(new java.io.File(d)))
    val ledger = new graft.ops.StreamQueries.CumLedger
    val tiered = topTalkerSketchWriter(s"$dirT/sketch", s"$dirT/rows",
      s"$dirT/hh", 2, s"$dirT/cum", ledger, tierDir = s"$dirT/tier")
    val untiered = topTalkerSketchWriter(s"$dirU/sketch", s"$dirU/rows",
      s"$dirU/hh", 2, s"$dirU/cum")
    (0 until 12).foreach { id =>
      val b = flowBatch(id * 20 until id * 20 + 20)
      tiered(b, id.toLong); untiered(b, id.toLong)
    }
    Seq(1, 3, 5, 7, 9, 11).foreach { id =>
      val got = spark.read.parquet(s"$dirT/hh/batch=$id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val other = spark.read.parquet(s"$dirU/hh/batch=$id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val all = flowBatch(0 until (id + 1) * 20)
        .groupBy("src_addr").agg(sum("bytes").as("sum_bytes"),
          count(lit(1)).as("n_flows"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val total = all.map(_._2).sum
      val want = all.filter(_._2 * FlowHhThetaInv >= total)
        .map(t => (t._1, t._2, t._3, t._2 * 1000000L / total)).toSet
      assert(want.nonEmpty, s"degenerate fixture at watermark $id")
      assert(got == want, s"watermark $id not exact: $got != $want")
      assert(got == other, s"watermark $id: tiered != untiered")
    }
    val gens = graft.ext.SimilarityQueries.completeGens(spark, s"$dirT/tier")
    assert(gens.exists(_.level >= 1),
      s"no level>=1 gen after 6 maintenance cycles: $gens")
    val firings = ledger.rows.toSeq.filter(_.fired)
    assert(firings.forall(_.histBatchesRead == 0L))
    assert(firings.filter(_.entrants > 0).forall(_.catchupBytes >= 0L))
  }

  test("a poison fragment from a crashed firing is swept before the next summary lands") {
    import spark.implicits._
    val batches = seededBatches(20260818L, 6)
    val dir = s"${graft.Tmp.root}/hhtier-orphan"
    FileUtils.deleteQuietly(new java.io.File(dir))
    val writer = heavyHitterSketchWriter(s"$dir/sketch", s"$dir/rows",
      s"$dir/hh", 2, s"$dir/cum", null, capacity = 16, thetaInv = 10L,
      tierDir = s"$dir/tier")
    // batches 0..3 commit (firings at 1 and 3) …
    (0 until 4).foreach(id => writer(batches(id).toDF("doc_id", "text"), id.toLong))
    // … then a crashed firing leaves a POISON summary strictly inside
    // (prevGenId=3, nextFiring=5): huge counts that would corrupt any
    // fold that reads it
    Seq(("alpha beta gamma", 1000000L)).toDF("gram", "cnt")
      .coalesce(1).write.parquet(s"$dir/tier/frag/batch=4")
    (4 until 6).foreach(id => writer(batches(id).toDF("doc_id", "text"), id.toLong))
    val (fs, fragBase) = graft.ext.SimilarityQueries
      .fsAndPath(spark, s"$dir/tier/frag/batch=4")
    assert(!fs.exists(fragBase), "poison fragment survived the orphan sweep")
    val got = spark.read.parquet(s"$dir/hh/batch=5").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exactAt(batches, 5), "artifact corrupted by orphan fragment")
  }
}
