package graft.streaming

import java.net.{HttpURLConnection, URI}
import java.nio.file.Paths

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** R6 end-to-end: run a stream with the MetricsListener attached, scrape
  * /metrics over real HTTP, and watch the counters advance
  * (`main.go:177-180` parity).
  */
class MetricsServerSpec extends SparkSpec {

  private def scrape(port: Int): Map[String, Double] = {
    val conn = new URI(s"http://127.0.0.1:$port/metrics").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      assert(conn.getResponseCode == 200)
      assert(conn.getContentType.startsWith("text/plain"))
      val text = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      text.linesIterator.filterNot(_.startsWith("#")).map { l =>
        val Array(k, v) = l.split(" ", 2)
        k -> v.toDouble
      }.toMap
    } finally conn.disconnect()
  }

  test("/metrics serves pipeline counters that advance with the stream") {
    val listener = new FlowPipeline.MetricsListener
    val server = new MetricsServer(listener)
    spark.streams.addListener(listener)
    val cp = "/root/repo/target/graft-tmp/metrics-spec/cp"
    FileUtils.deleteQuietly(Paths.get(cp).toFile)
    try {
      val before = scrape(server.boundPort)
      assert(before.contains("graft_flows_rows_total"))

      val q = FlowPipeline.normalize(
        spark.readStream.format("flowgen")
          .option("totalRows", 5000L).option("maxRowsPerBatch", 1000L).load())
        .writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      // progress events are delivered async; poll the scrape until they land
      val deadline = System.nanoTime() + 30_000_000_000L
      var after = scrape(server.boundPort)
      while (after("graft_flows_rows_total") < before("graft_flows_rows_total") + 5000 &&
          System.nanoTime() < deadline) {
        Thread.sleep(100); after = scrape(server.boundPort)
      }
      assert(after("graft_flows_rows_total") >= before("graft_flows_rows_total") + 5000)
      assert(after("graft_flows_batches_total") > before("graft_flows_batches_total"))
      // R4 admission invariant, observable at the scrape surface
      assert(after("graft_flows_max_batch_rows") <= 1000)
    } finally {
      spark.streams.removeListener(listener)
      server.stop()
    }
  }

  test("sFlow interface counters render as labeled gauges") {
    val listener = new FlowPipeline.MetricsListener
    val server = new MetricsServer(listener)
    try {
      graft.sources.UdpFlowSource.ifCounters.put(("10.0.0.9", 3L),
        graft.sources.SFlowV5.IfCounters(3, 10000000000L, 777L, 7L, 0L, 888L, 8L, 2L))
      val m = scrape(server.boundPort)
      assert(m("""graft_sflow_if_in_octets{agent="10.0.0.9",ifindex="3"}""") == 777.0, m)
      assert(m("""graft_sflow_if_out_octets{agent="10.0.0.9",ifindex="3"}""") == 888.0, m)
      assert(m("""graft_sflow_if_out_errors{agent="10.0.0.9",ifindex="3"}""") == 2.0, m)
    } finally server.stop()
  }

  test("ethernet/vlan/processor counter records render as labeled gauges") {
    import graft.sources.{SFlowV5 => SF, UdpFlowSource => U}
    val listener = new FlowPipeline.MetricsListener
    val server = new MetricsServer(listener)
    try {
      U.ethCounters.put(("10.0.0.8", 7L),
        SF.EthernetCounters(1, 20, 0, 0, 0, 0, 5, 0, 0, 0, 0, 0, 13))
      U.vlanCounters.put(("10.0.0.8", 42L),
        SF.VlanCounters(42, 9999L, 55, 5, 3, 2))
      U.procCounters.put("10.0.0.8",
        SF.ProcessorCounters(17, 12, 9, 8L << 30, 2L << 30))
      val m = scrape(server.boundPort)
      assert(m("""graft_sflow_eth_fcs_errors{agent="10.0.0.8",source="7"}""") == 20.0, m)
      assert(m("""graft_sflow_eth_symbol_errors{agent="10.0.0.8",source="7"}""") == 13.0, m)
      assert(m("""graft_sflow_vlan_octets{agent="10.0.0.8",vlan="42"}""") == 9999.0, m)
      assert(m("""graft_sflow_vlan_discards{agent="10.0.0.8",vlan="42"}""") == 2.0, m)
      assert(m("""graft_sflow_proc_cpu_5s_pct{agent="10.0.0.8"}""") == 17.0, m)
      assert(m("""graft_sflow_proc_free_memory_bytes{agent="10.0.0.8"}""") ==
        (2L << 30).toDouble, m)
    } finally server.stop()
  }

  test("cadence churn alert increments the scraped counter (VERDICT r17 #6)") {
    import spark.implicits._
    // the HhRecountCadenceSpec churn geometry, tuned so the alert MUST
    // fire: capacity 16 / θinv 10 / recountEvery 2 over 16 batches, each
    // batch dominated by a FRESH trigram ("c<b>x c<b>y c<b>z" × 6 docs —
    // 16 distinct grams ≤ capacity, so the sketch is exact and every
    // batch's gram clears the prune floor N/10 − N/17). All 8 firings
    // then carry entrants, which is exactly ChurnAlertFirings — the
    // one-shot alert fires at the last firing and must be visible at the
    // /metrics scrape, not just on executor stderr.
    val dir = s"${graft.Tmp.root}/metrics-churn"
    FileUtils.deleteQuietly(new java.io.File(dir))
    val listener = new FlowPipeline.MetricsListener
    val server = new MetricsServer(listener)
    try {
      val before = scrape(server.boundPort)("graft_cadence_churn_alerts_total")
      val writer = graft.ops.StreamQueries.heavyHitterSketchWriter(
        s"$dir/sketch", s"$dir/rows", s"$dir/hh", 2, s"$dir/cum", null,
        capacity = 16, thetaInv = 10L)
      (0 until 16).foreach { b =>
        val docs = (0 until 6)
          .map(i => ((b * 6 + i).toLong, s"c${b}x c${b}y c${b}z"))
          .toDF("doc_id", "text")
        writer(docs, b.toLong)
      }
      // >= not ==: the adder is JVM-global and another concurrently
      // running suite's writer could legitimately alert in the window
      val after = scrape(server.boundPort)("graft_cadence_churn_alerts_total")
      assert(after >= before + 1.0,
        s"churn alert not scraped: before=$before after=$after")
    } finally server.stop()
  }
}
