package graft.ext

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** x3t: Matryoshka prefix-dimension shortlist + exact rerank — serving
  * contract (8 queries × top-5, rank totality, shortlist bound) and the
  * rerank-order invariant. Recall itself is fixture-dependent and
  * documented in the registration; the oracle gate proves selection.
  */
class MatryoshkaSpec extends SparkSpec {

  private lazy val out =
    Registry.queries("x3t_matryoshka")(spark, sf).collect()

  test("every query gets exactly ranks 1..5") {
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8, s"expected 8 query ids, got ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5),
        s"query $q ranks: ${rows.map(_.getAs[Int]("rank")).toSeq}")
    }
  }

  test("rerank order is by exact full-dim cosine, and shortlist bound holds") {
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      val cos = byRank.map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"query $q cos not non-increasing: ${cos.toSeq}")
      assert(rows.forall(_.getAs[Int]("mr_rank") <= 40),
        s"query $q has mr_rank beyond the shortlist depth")
    }
  }

  test("prefix scoring really truncates: a top hit can disagree with exact") {
    // On the random-uniform fixture the 16-of-64 prefix is lossy by
    // construction — at least one emitted row should fall outside the
    // exact top-5 (if ALL rows were in_exact_top5 the prefix would be
    // doing nothing, i.e. the slice was silently ignored).
    assert(out.exists(!_.getAs[Boolean]("in_exact_top5")),
      "every shortlist hit was exact — prefix truncation had no effect?")
    // ...and the annotation is not all-false either (rerank does recover
    // some of the exact set even from a lossy shortlist).
    assert(out.exists(_.getAs[Boolean]("in_exact_top5")),
      "no shortlist hit was exact — shortlist or rerank is broken")
  }
}
