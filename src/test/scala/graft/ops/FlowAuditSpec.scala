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

  test("qf11: funnel levels are consistent with per-step event presence") {
    import org.apache.spark.sql.functions._
    val out = Registry.queries("qf11_window_funnel")(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level")).toMap
    val ev = graft.Tables.events(spark, sf)
    val users = ev.select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.keySet == users, "one verdict per user")
    assert(out.values.forall(l => l >= 0 && l <= 3))
    def withType(t: String) = ev.where(col("event_type") === t)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val (v, c, p) = (withType("view"), withType("click"), withType("purchase"))
    // level >= k implies the step-k event type exists for the user at all
    // (the window can only REMOVE levels, never add them)
    out.foreach { case (u, l) =>
      if (l >= 1) assert(v(u), s"user $u level $l without a view")
      if (l >= 2) assert(c(u), s"user $u level $l without a click")
      if (l >= 3) assert(p(u), s"user $u level $l without a purchase")
    }
    // ...and a user with a view can never be level 0
    users.foreach { u => if (v(u)) assert(out(u) >= 1, s"user $u") }
  }

  test("qf12: retention counts are bounded by the day-1 cohort") {
    val r = Registry.queries("qf12_retention")(spark, sf).collect().head
    val n = r.getAs[Long]("n_day1")
    Seq("ret_day10", "ret_day20", "ret_day30").foreach { c =>
      val v = r.getAs[Long](c)
      assert(v >= 0 && v <= n, s"$c=$v outside [0, $n]")
    }
  }

  test("qf13: pagerank mass flows to destinations; teleport floor holds") {
    import org.apache.spark.sql.functions._
    val rows = Registry.queries("qf13_pagerank")(spark, sf).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getAs[Long]("rank_nano"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b },
      "top-20 not rank-ordered")
    // the flow graph is bipartite src(10.x) → dst(192.168.x): every dst
    // is a sink, so after any iteration the top centrality nodes must be
    // destinations (sources only ever hold teleport + dangling share)
    assert(rows.forall(_.getAs[String]("addr").startsWith("192.168.")),
      s"non-destination in top-20: ${rows.map(_.get(0)).toSeq}")
    // every rank includes the uniform teleport floor
    val f = FlowQueries.flows(spark, sf)
    val n = f.select(col("src_addr")).union(f.select(col("dst_addr")))
      .distinct().count()
    val floor = (1000000000L * 15) / (100 * n)
    assert(ranks.forall(_ >= floor), s"rank below teleport floor $floor")
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
