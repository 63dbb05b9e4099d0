package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x11: series similarity — planted-series contract (the fixture's series
  * are arbitrary): z-normalization makes a level-shifted copy distance 0,
  * the PAA segment distance lower-bounds the true distance on every pair
  * (Keogh's bound — what makes the shortlist lossy only in the DECLARED
  * way), and the emitted top-k respects the shortlist bound.
  */
class SeriesKnnSpec extends SparkSpec {

  private def value(u: Int, i: Int): Double = u match {
    case 1 => i.toDouble            // ramp
    case 2 => i + 100.0             // level-shifted ramp: z-identical to 1
    case 3 => 39.0 - i              // reversed ramp
    case 4 => (i % 2) * 10.0        // alternating
    case 5 => (i * i % 37).toDouble // scrambled
    case _ => (i * 7 % 13).toDouble // scrambled
  }

  private lazy val planted = {
    import spark.implicits._
    (for { u <- 1 to 6; i <- 0 until 40 }
      yield (u.toLong, i.toLong, (u * 1000 + i).toLong, value(u, i)))
      .toDF("user_id", "ts", "event_id", "value")
  }

  test("level-shifted copy is found at distance zero (z-norm invariance)") {
    val out = SeriesQueries.seriesKnn(SeriesQueries.seriesFrame(planted))
      .collect()
    val q1top = out.filter(r => r.getAs[Long]("q_user") == 1L &&
      r.getAs[Int]("rank") == 1).head
    assert(q1top.getAs[Long]("c_user") == 2L)
    assert(q1top.getAs[Long]("dist2_e4") == 0L,
      s"shift-invariant pair not at distance 0: ${q1top}")
    assert(q1top.getAs[Boolean]("in_exact_top3"))
    val q2top = out.filter(r => r.getAs[Long]("q_user") == 2L &&
      r.getAs[Int]("rank") == 1).head
    assert(q2top.getAs[Long]("c_user") == 1L &&
      q2top.getAs[Long]("dist2_e4") == 0L)
    // contract shape: every query emits ranks 1..3 within the shortlist
    out.groupBy(_.getAs[Long]("q_user")).foreach { case (qu, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3), s"q $qu")
      assert(rows.forall(_.getAs[Int]("paa_rank") <= 12), s"q $qu")
    }
  }

  test("x11b: the z-identical pair is also DTW-0 at rank 1") {
    val out = SeriesQueries.dtwKnn(SeriesQueries.seriesFrame(planted)).collect()
    val q1top = out.filter(r => r.getAs[Long]("q_user") == 1L &&
      r.getAs[Int]("rank") == 1).head
    assert(q1top.getAs[Long]("c_user") == 2L &&
      q1top.getAs[Long]("dtw_e4") == 0L, s"$q1top")
    assert(q1top.getAs[Boolean]("in_exact_top3"))
    out.groupBy(_.getAs[Long]("q_user")).foreach { case (qu, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3), s"q $qu")
      assert(rows.forall(_.getAs[Int]("lb_rank") <= 12), s"q $qu")
    }
  }

  test("PAA segment distance lower-bounds the true distance on every pair") {
    val sf = SeriesQueries.seriesFrame(planted)
      .select(col("user_id"), col("z"), col("paa")).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getSeq[Double](1), r.getSeq[Double](2)))
    assert(sf.length == 6)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for {
      (ua, za, pa) <- sf
      (ub, zb, pb) <- sf if ua != ub
    } {
      val lower = d2(pa, pb) * 4.0 // segment width N/Segs
      val exact = d2(za, zb)
      assert(lower <= exact + 1e-9,
        s"PAA bound violated for ($ua,$ub): $lower > $exact")
    }
  }
}
