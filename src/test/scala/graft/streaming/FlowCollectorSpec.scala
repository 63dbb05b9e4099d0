package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, HttpURLConnection, InetAddress, URI}
import java.nio.file.Paths

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{NetFlowV5 => V5, SFlowV5 => SF}

/** The whole reference daemon in one call: exporters send datagrams, flows
  * land in the sink, /metrics reports progress (`main.go:183-268` parity).
  */
class FlowCollectorSpec extends SparkSpec {

  test("collector ingests UDP flows to parquet and serves metrics") {
    val tmp = "/root/repo/target/graft-tmp/collector-spec"
    val out = s"$tmp/out"; val cp = s"$tmp/cp"
    Seq(out, cp).foreach(p => FileUtils.deleteQuietly(Paths.get(p).toFile))

    val c = FlowCollector.start(spark, outDir = out, checkpoint = cp,
      name = "collector-spec", batchMaxTime = "200 milliseconds")
    val sock = new DatagramSocket()
    try {
      assert(c.udpPort > 0 && c.metricsPort > 0)
      val addr = InetAddress.getByName("127.0.0.1")
      def send(b: Array[Byte]): Unit =
        sock.send(new DatagramPacket(b, b.length, addr, c.udpPort))

      val v5 = V5.encode(1000L, 1700000700L, 0L, 1L, 100,
        (0 until 5).map(i => V5.Rec(Array[Byte](10, 0, 1, i.toByte),
          Array[Byte](10, 0, 2, 1), pkts = 1, octets = 500 + i,
          firstMs = 0, lastMs = 0, srcPort = 1000 + i, dstPort = 443,
          tcpFlags = 18, proto = 6)))
      val sflow = SF.encode(Array[Byte](10, 0, 0, 9), 2L,
        Seq((256L, 900L, SF.ipv4Frame(Array[Byte](10, 1, 1, 1),
          Array[Byte](10, 1, 1, 2), proto = 17, srcPort = 53, dstPort = 5353))))

      val deadline = System.nanoTime() + 60_000_000_000L
      def sunkRows(): Long =
        try spark.read.parquet(out).count() catch { case _: Exception => 0L }
      while (sunkRows() < 6 && System.nanoTime() < deadline) {
        send(v5); send(sflow)
        Thread.sleep(200)
      }
      // NOTE: no dedup option here, so re-sent packets may land twice —
      // assert on distinct flows, the idempotent-sink path is the dedup story
      val flows = spark.read.parquet(out)
      assert(flows.schema.fieldNames.toSeq == graft.FlowSchema.schema.fieldNames.toSeq)
      assert(flows.filter(col("type") === 2).select("src_port").distinct().count() == 5)
      assert(flows.filter(col("type") === 1 && col("dst_port") === 5353).count() >= 1)

      // metrics visible over HTTP
      val conn = new URI(s"http://127.0.0.1:${c.metricsPort}/metrics").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      try {
        assert(conn.getResponseCode == 200)
        val text = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        val rows = text.linesIterator
          .find(_.startsWith("graft_flows_rows_total")).get.split(" ")(1).toDouble
        assert(rows >= 6.0, text)
      } finally conn.disconnect()
    } finally { sock.close(); c.stop(spark) }
  }

  test("URL-list collector: two live listeners, per-listener scheme + metrics") {
    // the reference's CLI default shape: -listen sflow://:6343,netflow://:2055
    // (main.go:31) — here with nfl for a deterministic v5 payload and
    // ephemeral ports
    val tmp = "/root/repo/target/graft-tmp/collector-urls"
    val out = s"$tmp/out"; val cp = s"$tmp/cp"
    Seq(out, cp).foreach(p => FileUtils.deleteQuietly(Paths.get(p).toFile))

    val c = FlowCollector.startUrls(spark, "nfl://:0,sflow://:0",
      outDir = out, checkpoint = cp, name = "collector-urls",
      batchMaxTime = "200 milliseconds")
    val sock = new DatagramSocket()
    try {
      assert(c.listeners.size == 2)
      val Seq(nfl, sfl) = c.listeners
      assert(nfl.scheme == "nfl" && sfl.scheme == "sflow")
      assert(nfl.port > 0 && sfl.port > 0 && nfl.port != sfl.port)
      val addr = InetAddress.getByName("127.0.0.1")
      def send(b: Array[Byte], port: Int): Unit =
        sock.send(new DatagramPacket(b, b.length, addr, port))

      val v5 = V5.encode(1000L, 1700000700L, 0L, 1L, 100,
        (0 until 3).map(i => V5.Rec(Array[Byte](10, 0, 1, i.toByte),
          Array[Byte](10, 0, 2, 1), pkts = 1, octets = 500 + i,
          firstMs = 0, lastMs = 0, srcPort = 2000 + i, dstPort = 443,
          tcpFlags = 18, proto = 6)))
      val sflow = SF.encode(Array[Byte](10, 0, 0, 9), 2L,
        Seq((256L, 900L, SF.ipv4Frame(Array[Byte](10, 1, 1, 1),
          Array[Byte](10, 1, 1, 2), proto = 17, srcPort = 53, dstPort = 5353))))

      val deadline = System.nanoTime() + 60_000_000_000L
      def sunkRows(): Long =
        try spark.read.parquet(out).count() catch { case _: Exception => 0L }
      while (sunkRows() < 4 && System.nanoTime() < deadline) {
        send(v5, nfl.port); send(sflow, sfl.port)
        // wrong-scheme cross-traffic: the v5 packet at the sFlow listener
        // must be REFUSED there (goflow's per-state decoder parity) and
        // counted as that listener's drop
        send(v5, sfl.port)
        Thread.sleep(200)
      }
      val flows = spark.read.parquet(out)
      // both protocols landed through their own listeners...
      assert(flows.filter(col("type") === 2).select("src_port").distinct().count() == 3)
      assert(flows.filter(col("type") === 1 && col("dst_port") === 5353).count() >= 1)
      // ...and the v5 flows came ONLY through the nfl listener: had the
      // sFlow socket admitted the cross-sent v5 packet there would be
      // duplicate-free proof no matter what, so check the counters below

      // per-listener counters over /metrics
      val conn = new URI(s"http://127.0.0.1:${c.metricsPort}/metrics").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      try {
        assert(conn.getResponseCode == 200)
        val text = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        def counter(metric: String, l: String): Double = text.linesIterator
          .find(_.startsWith(s"""$metric{listener="$l"}"""))
          .map(_.split(' ').last.toDouble)
          .getOrElse(fail(s"missing $metric for $l:\n$text"))
        val rx = "graft_udp_listener_received_total"
        val dr = "graft_udp_listener_dropped_total"
        assert(counter(rx, nfl.name) >= 1.0, "nfl listener admitted nothing")
        assert(counter(rx, sfl.name) >= 1.0, "sflow listener admitted nothing")
        // scheme restriction: every cross-sent v5 packet is a drop at the
        // sFlow listener, and the nfl listener (receiving only clean v5)
        // dropped nothing
        assert(counter(dr, sfl.name) >= 1.0, "wrong-scheme packet not counted as drop")
        assert(counter(dr, nfl.name) == 0.0, "clean v5 traffic miscounted as drops")
      } finally conn.disconnect()
    } finally { sock.close(); c.stop(spark) }
  }

  test("listen URL parsing matches the reference's accepted shapes") {
    import FlowCollector.{ListenUrl, parseListen}
    assert(parseListen("sflow://:6343,netflow://:2055") ==
      Seq(ListenUrl("sflow", "127.0.0.1", 6343), ListenUrl("netflow", "127.0.0.1", 2055)))
    assert(parseListen("nfl://0.0.0.0:2056") == Seq(ListenUrl("nfl", "0.0.0.0", 2056)))
    intercept[IllegalArgumentException](parseListen("udp://:99"))
    intercept[IllegalArgumentException](parseListen("sflow://"))
    intercept[IllegalArgumentException](parseListen("garbage"))
    // IPv6: bracketed form accepted with brackets stripped (url.Parse
    // parity); an unbracketed multi-colon host would mis-split on the
    // last ':' and must fail at parse time, not at bind (ADVICE r08)
    assert(parseListen("sflow://[::1]:6343") == Seq(ListenUrl("sflow", "::1", 6343)))
    assert(parseListen("netflow://[fe80::1]:2055") ==
      Seq(ListenUrl("netflow", "fe80::1", 2055)))
    val amb = intercept[IllegalArgumentException](parseListen("sflow://::1:6343"))
    assert(amb.getMessage.contains("[::1]:6343"), "error must name the bracketed fix")
    intercept[IllegalArgumentException](parseListen("sflow://[::1]6343"))
    intercept[IllegalArgumentException](parseListen("sflow://[::1]:"))
  }

  test("a failed start releases the query, listener and metrics port") {
    // ADVICE r3: a failure after resources are acquired (here: an
    // uncreatable checkpoint dir) used to leak the started query, the
    // listener and the HTTP port with no handle to stop them
    val activeBefore = spark.streams.active.length
    val listenersBefore = spark.streams.listListeners().length
    // grab a concrete free port so we can prove it is released
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()

    intercept[Exception] {
      FlowCollector.start(spark, outDir = "/root/repo/target/graft-tmp/fc-fail",
        checkpoint = "/proc/nonexistent/cp", name = "collector-fail",
        metricsPort = port)
    }
    assert(spark.streams.active.length == activeBefore, "query leaked")
    assert(spark.streams.listListeners().length == listenersBefore, "listener leaked")
    // the metrics port must be bindable again
    val rebind = new java.net.ServerSocket(port)
    rebind.close()
  }
}
