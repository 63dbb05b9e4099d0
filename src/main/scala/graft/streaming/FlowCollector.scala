package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.UdpFlowSource

/** The reference's whole `main()` as one call (`main.go:183-268`): UDP
  * flow listeners → decode → 23-column normalize → micro-batched sink,
  * with Prometheus metrics over HTTP — assembled from the parts this
  * library ships. A goflow2clickhouse operator switching to Spark runs
  * exactly this:
  *
  * {{{
  * val c = FlowCollector.start(spark,
  *   outDir = "/data/flows", checkpoint = "/data/cp", udpPort = 2055)
  * // exporters -> udp://host:c.udpPort ; scrape http://host:c.metricsPort/metrics
  * // ... c.stop(spark)
  * }}}
  *
  * The sink writes parquet here; swap the `foreachBatch` body (see
  * [[FlowPipeline.start]] / [[graft.sources.JdbcSink]]) for the ClickHouse
  * JDBC URL in production — `JdbcSink.idempotentAppend` upgrades the
  * reference's at-most-once to effectively-once.
  */
object FlowCollector {

  final case class Running(
      query: StreamingQuery,
      listener: FlowPipeline.MetricsListener,
      metrics: MetricsServer,
      udpPort: Int) {
    def metricsPort: Int = metrics.boundPort
    def stop(spark: SparkSession): Unit = {
      query.stop()
      spark.streams.removeListener(listener)
      metrics.stop()
    }
  }

  /** Start the collector; blocks only until the UDP port is bound. */
  def start(spark: SparkSession, outDir: String, checkpoint: String,
      udpPort: Int = 0, name: String = "collector", metricsPort: Int = 0,
      batchMaxTime: String = "10 seconds", maxPacketsPerBatch: Long = 1000L,
      numPartitions: Int = 4): Running = {
    val listener = new FlowPipeline.MetricsListener
    spark.streams.addListener(listener)
    var server: MetricsServer = null
    var q: StreamingQuery = null
    // every failure past a resource acquisition must release what exists —
    // a bind-wait timeout would otherwise leak the query, the listener and
    // the metrics HTTP port with no handle left to stop them
    try {
      server = new MetricsServer(listener, metricsPort)
      val raw = spark.readStream.format("nflv5-udp")
        .option("port", udpPort).option("name", name)
        .option("maxPacketsPerBatch", maxPacketsPerBatch)
        .option("numPartitions", numPartitions)
        .load()
      q = FlowPipeline.start(FlowPipeline.normalize(raw), outDir, checkpoint,
        batchMaxTime)
      val deadline = System.nanoTime() + 30_000_000_000L
      var port = 0
      while (port == 0 && System.nanoTime() < deadline) {
        // a query that died at startup (port in use, bad checkpoint) will
        // never register a port — surface ITS error now instead of
        // spinning 30 s and masking it with a misleading bind message
        if (!q.isActive) throw q.exception
          .map(e => new IllegalStateException(
            "collector query failed during startup", e))
          .getOrElse(new IllegalStateException(
            "collector query stopped during startup"))
        port = UdpFlowSource.boundPort(name).getOrElse(0)
        if (port == 0) Thread.sleep(20)
      }
      require(port > 0, "UDP listener failed to bind")
      Running(q, listener, server, port)
    } catch {
      case e: Throwable =>
        if (q != null) { try q.stop() catch { case _: Exception => () } }
        spark.streams.removeListener(listener)
        if (server != null) { try server.stop() catch { case _: Exception => () } }
        throw e
    }
  }
}
