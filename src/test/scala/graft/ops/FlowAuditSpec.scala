package graft.ops

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** qf9 (k-anonymity audit) and qf10 (destination fan-in + source entropy):
  * the structural invariants the oracle hash can't articulate — threshold
  * monotonicity, exposure bounds, entropy range.
  */
class FlowAuditSpec extends SparkSpec {

  test("qf9: violations are monotone in k and bounded by the table") {
    val rows = Registry.queries("qf9_k_anonymity")(spark, sf).collect()
      .sortBy(_.getAs[Long]("k_threshold"))
    assert(rows.map(_.getAs[Long]("k_threshold")).toSeq == Seq(2L, 5L, 10L))
    // class universe is threshold-independent
    assert(rows.map(_.getAs[Long]("n_classes")).distinct.size == 1)
    val small = rows.map(_.getAs[Long]("n_small_classes"))
    val exposed = rows.map(_.getAs[Long]("n_exposed_rows"))
    assert(small.zip(small.tail).forall { case (a, b) => a <= b },
      s"n_small_classes not monotone: ${small.toSeq}")
    assert(exposed.zip(exposed.tail).forall { case (a, b) => a <= b },
      s"n_exposed_rows not monotone: ${exposed.toSeq}")
    val totalFlows = FlowQueries.flows(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_small_classes") <= r.getAs[Long]("n_classes"))
      assert(r.getAs[Long]("n_exposed_rows") <= totalFlows)
      // a class below k has at most k-1 rows
      assert(r.getAs[Long]("n_exposed_rows") <=
        r.getAs[Long]("n_small_classes") * (r.getAs[Long]("k_threshold") - 1))
    }
  }

  test("qf10: entropy lies in [0, log2(n_srcs)] and counts are consistent") {
    val rows = Registry.queries("qf10_dst_fanin")(spark, sf).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val nSrcs = r.getAs[Long]("n_srcs")
      val h = r.getAs[Long]("src_entropy_e4")
      assert(r.getAs[Long]("n_flows") >= nSrcs)
      assert(h >= 0, s"${r.get(0)}: negative entropy $h")
      // +1 slack for the e4 rounding of both sides
      val hMax = math.round(math.log(nSrcs.toDouble) / math.log(2.0) * 10000) + 1
      assert(h <= hMax, s"${r.get(0)}: entropy $h above log2($nSrcs)≈$hMax")
    }
    // ordered by fan-in desc, dst_addr asc
    val key = rows.map(r => (-r.getAs[Long]("n_srcs"), r.getAs[String]("dst_addr")))
    assert(key.zip(key.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) },
      "top-15 not in (n_srcs desc, dst_addr) order")
  }
}
