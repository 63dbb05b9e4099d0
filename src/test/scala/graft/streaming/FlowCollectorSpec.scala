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
