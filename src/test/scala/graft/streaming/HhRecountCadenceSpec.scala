package graft.streaming

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q52t's periodic recount cadence (r15, VERDICT r14 #4): every
  * `recountEvery`-th batch the sketch writer must overwrite an
  * `_SUCCESS`-gated `hh/batch=<id>` artifact holding the θ-filtered
  * EXACT heavy hitters over the rows ingested so far — the answer an
  * always-on trending monitor serves between drains. Pins: the cadence
  * fires at the right batch ids, each artifact equals the exact
  * recomputation at that cycle's watermark (no sketch anywhere in the
  * check), and a whole-batch replay re-derives the identical artifact
  * (the effectively-once contract the q52y store machinery set).
  */
class HhRecountCadenceSpec extends SparkSpec {

  import graft.ops.StreamQueries.{heavyHitterSketchWriter, latestSketchGen}

  private def base(tag: String): String = {
    val dir = s"${graft.Tmp.root}/hhcadence-$tag"
    FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  /** Exact θ-filtered heavy hitters over `docs` — the ground truth the
    * artifact must equal, computed with plain aggregation.
    */
  private def exactAt(docs: org.apache.spark.sql.DataFrame) = {
    val grams = graft.ext.TextQueries.heavyHitterGrams(docs)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
    val total = graft.ext.TextQueries.heavyHitterGrams(docs)
      .agg(count(lit(1)).as("total"))
    grams.crossJoin(total)
      .filter(col("cnt") * graft.ext.TextQueries.HhThetaInv >= col("total"))
      .select(col("gram"), col("cnt"), expr("cnt * 1000000 DIV total").as("ppm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def docsBatch(ids: Range) = {
    import spark.implicits._
    // a skewed corpus: one hot trigram repeated everywhere + unique tails
    ids.map(i => (i.toLong,
      if (i % 3 == 0) s"alpha beta gamma tail$i x$i"
      else s"alpha beta gamma delta$i y$i z$i")).toDF("doc_id", "text")
  }

  test("cadence fires on schedule and each artifact is watermark-exact") {
    val dir = base("sched")
    val (sk, rows, hh, cum) =
      (s"$dir/sketch", s"$dir/rows", s"$dir/hh", s"$dir/cum")
    val writer = heavyHitterSketchWriter(sk, rows, hh, 2, cum)
    (0 to 5).foreach(id => writer(docsBatch(id * 10 until id * 10 + 10), id))
    val fs = new org.apache.hadoop.fs.Path(hh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // fired at ids 1, 3, 5 and nowhere else, each _SUCCESS-complete
    assert(Seq(1, 3, 5).forall(i => fs.exists(
      new org.apache.hadoop.fs.Path(s"$hh/batch=$i/_SUCCESS"))))
    assert(Seq(0, 2, 4).forall(i => !fs.exists(
      new org.apache.hadoop.fs.Path(s"$hh/batch=$i"))))
    // each artifact equals the exact recomputation over rows 0..id
    Seq(1, 3, 5).foreach { id =>
      val got = spark.read.parquet(s"$hh/batch=$id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = exactAt(docsBatch(0 until (id + 1) * 10))
      assert(want.nonEmpty, s"degenerate fixture at watermark $id")
      assert(got == want, s"watermark $id: $got != $want")
    }
  }

  test("q52u's weighted cadence artifacts are watermark-exact too") {
    import spark.implicits._
    import graft.ops.StreamQueries.{topTalkerSketchWriter, FlowHhThetaInv}
    val dir = base("flows")
    val (sk, rows, hh, cum) =
      (s"$dir/sketch", s"$dir/rows", s"$dir/hh", s"$dir/cum")
    // skewed byte weights: one talker owns most of the traffic
    def flowBatch(ids: Range) = ids.map(i =>
      (if (i % 3 == 0) "10.0.0.1" else s"10.1.0.${i % 250}",
        if (i % 3 == 0) 50000L else 100L + i)).toDF("src_addr", "bytes")
    val writer = topTalkerSketchWriter(sk, rows, hh, 2, cum)
    (0 to 3).foreach(id => writer(flowBatch(id * 20 until id * 20 + 20), id))
    val fs = new org.apache.hadoop.fs.Path(hh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(Seq(1, 3).forall(i => fs.exists(
      new org.apache.hadoop.fs.Path(s"$hh/batch=$i/_SUCCESS"))))
    Seq(1, 3).foreach { id =>
      val got = spark.read.parquet(s"$hh/batch=$id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // sketch-free exact recomputation at the watermark
      val all = flowBatch(0 until (id + 1) * 20)
        .groupBy("src_addr").agg(sum("bytes").as("sum_bytes"),
          count(org.apache.spark.sql.functions.lit(1)).as("n_flows"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val total = all.map(_._2).sum
      val want = all.filter(_._2 * FlowHhThetaInv >= total)
        .map(t => (t._1, t._2, t._3, t._2 * 1000000L / total)).toSet
      assert(want.nonEmpty, s"degenerate fixture at watermark $id")
      assert(got == want, s"watermark $id: $got != $want")
    }
  }

  test("cadence firings read zero history once the candidate set settles") {
    import graft.ops.StreamQueries.CumLedger
    val dir = base("flat")
    val (sk, rows, hh, cum) =
      (s"$dir/sketch", s"$dir/rows", s"$dir/hh", s"$dir/cum")
    val ledger = new CumLedger
    val writer = heavyHitterSketchWriter(sk, rows, hh, 2, cum, ledger)
    // hot trigram everywhere, bounded tail vocabulary so the sketch's
    // candidate set goes quiet after the early batches
    def batch(ids: Range) = {
      import spark.implicits._
      ids.map(i => (i.toLong,
        s"alpha beta gamma tail${i % 7} x${i % 5} z")).toDF("doc_id", "text")
    }
    (0 to 9).foreach(id => writer(batch(id * 10 until id * 10 + 10), id))
    assert(ledger.rows.size == 10)
    // the O(T²) claim, inverted: after the vocabulary is fully seen (the
    // (i%7, i%5) pair space cycles with period 35, so by the end of batch
    // 3 every gram has appeared), NO batch — and in particular no cadence
    // firing — reads any history
    val tail = ledger.rows.drop(4)
    assert(tail.forall(_.entrants == 0L),
      s"late entrants: ${ledger.rows.map(_.entrants).mkString(",")}")
    assert(tail.forall(_.histBatchesRead == 0L),
      s"late history reads: ${ledger.rows.map(_.histBatchesRead).mkString(",")}")
    assert(ledger.rows.count(_.fired) == 5)
    // and the fold is still watermark-exact at the last firing
    val got = spark.read.parquet(s"$hh/batch=9")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = exactAt(batch(0 until 100))
    assert(want.nonEmpty && got == want)
  }

  test("whole-batch replay re-derives the identical hh artifact") {
    val dir = base("replay")
    val (sk, rows, hh, cum) =
      (s"$dir/sketch", s"$dir/rows", s"$dir/hh", s"$dir/cum")
    val writer = heavyHitterSketchWriter(sk, rows, hh, 2, cum)
    (0 to 3).foreach(id => writer(docsBatch(id * 10 until id * 10 + 10), id))
    val before = spark.read.parquet(s"$hh/batch=3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // replay batch 3 whole (the crash-recovery path): rows dir is
    // overwritten first, the sketch rebuilds from the gen strictly below
    // 3, and the hh artifact must come out identical
    writer(docsBatch(30 until 40), 3)
    val after = spark.read.parquet(s"$hh/batch=3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before)
    assert(latestSketchGen(spark, sk, below = Long.MaxValue)
      .exists(_.endsWith("batch=3")))
  }

  test("restart (cold cache) replays a NON-firing batch and continues exactly") {
    // the r17 firing-granularity fold keeps its state in writer memory on
    // the happy path; a restart starts from a FRESH closure, so the
    // rebuild path — last durable cum generation + a re-count over the ≤
    // recountEvery rows dirs above it — must reproduce the fold
    // byte-exactly. Replaying a NON-firing batch is the interesting case:
    // no durable cum gen exists at that id, so the next firing's window
    // fold leans entirely on the rebuilt (cum, total) pair.
    val dir = base("restart")
    val (sk, rows, hh, cum) =
      (s"$dir/sketch", s"$dir/rows", s"$dir/hh", s"$dir/cum")
    val writer = heavyHitterSketchWriter(sk, rows, hh, 2, cum)
    (0 to 3).foreach(id => writer(docsBatch(id * 10 until id * 10 + 10), id))
    val hh3 = spark.read.parquet(s"$hh/batch=3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // "crash" after batch 3, checkpoint replays from batch 2: a NEW
    // writer (cold cache) re-runs 2 and 3, then continues with 4 and 5
    val writer2 = heavyHitterSketchWriter(sk, rows, hh, 2, cum)
    writer2(docsBatch(20 until 30), 2)
    writer2(docsBatch(30 until 40), 3)
    val hh3b = spark.read.parquet(s"$hh/batch=3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(hh3b == hh3, "cold-cache replay diverged at the firing")
    (4 to 5).foreach(id => writer2(docsBatch(id * 10 until id * 10 + 10), id))
    // the post-restart firing must still be watermark-exact
    val got = spark.read.parquet(s"$hh/batch=5")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = exactAt(docsBatch(0 until 60))
    assert(want.nonEmpty && got == want, s"post-restart firing: $got != $want")
  }

  test("weighted cadence survives a cold-cache restart identically") {
    import spark.implicits._
    import graft.ops.StreamQueries.topTalkerSketchWriter
    val dir = base("wrestart")
    val (sk, rows, hh, cum) =
      (s"$dir/sketch", s"$dir/rows", s"$dir/hh", s"$dir/cum")
    def flowBatch(ids: Range) = ids.map(i =>
      (if (i % 3 == 0) "10.0.0.1" else s"10.1.0.${i % 250}",
        if (i % 3 == 0) 50000L else 100L + i)).toDF("src_addr", "bytes")
    val w1 = topTalkerSketchWriter(sk, rows, hh, 2, cum)
    (0 to 3).foreach(id => w1(flowBatch(id * 20 until id * 20 + 20), id))
    val before = spark.read.parquet(s"$hh/batch=3").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // fresh writer = cold cache: replay the non-firing batch 2, re-fire 3
    val w2 = topTalkerSketchWriter(sk, rows, hh, 2, cum)
    w2(flowBatch(40 until 60), 2)
    w2(flowBatch(60 until 80), 3)
    val after = spark.read.parquet(s"$hh/batch=3").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(after == before, "weighted cold-cache replay diverged")
  }
}
