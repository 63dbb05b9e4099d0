package graft.streaming

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property certificate for the r16 mergeable cadence fold: under FORCED
  * candidate churn and pruning — capacity (16) far below the vocabulary
  * (~60 grams), θinv (10) inside the superset precondition capacity + 1 >
  * θinv — every firing's artifact must still equal the exact sketch-free
  * θ-filtered recount at that watermark, on randomized (seeded) corpora.
  * This is the path the fixture specs cannot reach: there the capacity
  * dwarfs the vocabulary, so entrants stop and the pruning cut never
  * bites; here candidates rotate every batch, grams drop out of the cum
  * store and re-enter through the catch-up, and exactness has to come
  * from the fold algebra, not from a stable candidate set.
  */
class HhCadencePropertySpec extends SparkSpec {

  import graft.ops.StreamQueries.heavyHitterSketchWriter

  test("firing artifacts are watermark-exact under churn + pruning (seeded trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val vocab = (0 until 20).map(i => s"w$i")
    for (trial <- 0 until 4) {
      val dir = s"${graft.Tmp.root}/hhprop-$trial"
      FileUtils.deleteQuietly(new java.io.File(dir))
      val writer = heavyHitterSketchWriter(s"$dir/sketch", s"$dir/rows",
        s"$dir/hh", 2, s"$dir/cum", null, capacity = 16, thetaInv = 10L)
      // 4 batches × 8 docs; one hot phrase with ~1/3 density so the θ=1/10
      // filter has survivors, plus a rotating random tail that churns the
      // 16-slot sketch (distinct trigrams ≫ 16)
      val batches = (0 until 4).map { b =>
        (0 until 8).map { i =>
          val words =
            if (rnd.nextInt(3) == 0) Seq("alpha", "beta", "gamma")
            else Seq.fill(5)(vocab(rnd.nextInt(vocab.size)))
          ((b * 8 + i).toLong, words.mkString(" "))
        }
      }
      batches.zipWithIndex.foreach { case (docs, id) =>
        writer(docs.toDF("doc_id", "text"), id.toLong)
      }
      // every firing (ids 1, 3) equals the exact recount at its watermark
      Seq(1, 3).foreach { id =>
        val got = spark.read.parquet(s"$dir/hh/batch=$id").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        val soFar = batches.take(id + 1).flatten.toDF("doc_id", "text")
        val grams = graft.ext.TextQueries.heavyHitterGrams(soFar)
          .groupBy("gram").agg(count(lit(1)).as("cnt")).collect()
          .map(r => (r.getString(0), r.getLong(1)))
        val total = grams.map(_._2).sum
        val want = grams.filter(_._2 * 10L >= total)
          .map { case (g, c) => (g, c, c * 1000000L / total) }.toSet
        assert(got == want,
          s"trial $trial watermark $id: got $got want $want")
      }
    }
  }
}
