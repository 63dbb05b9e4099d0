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
  *
  * Restart semantics for v9/IPFIX templates: the template registry is
  * in-memory per stream (RFC 3954 §5 — templates are receiver state the
  * exporter re-announces periodically; goflow keeps them the same way).
  * After a collector restart, data records arriving BEFORE the exporter's
  * next template announcement are refused at admission and counted in the
  * listener's `template_misses`; refusal does not claim the dedup key, so
  * a re-sent copy after re-announcement decodes normally. Proven in
  * UdpIngestSpec ("v9 template state is re-learned after a collector
  * restart"). Checkpointed offsets resume independently of template state.
  */
object FlowCollector {

  /** One bound listener of a running collector: `name` keys the
    * per-listener /metrics labels and [[UdpFlowSource.boundPort]].
    */
  final case class Listener(name: String, scheme: String, host: String, port: Int)

  final case class Running(
      query: StreamingQuery,
      listener: FlowPipeline.MetricsListener,
      metrics: MetricsServer,
      udpPort: Int,
      listeners: Seq[Listener] = Seq.empty) {
    def metricsPort: Int = metrics.boundPort
    def stop(spark: SparkSession): Unit = {
      query.stop()
      spark.streams.removeListener(listener)
      metrics.stop()
    }
  }

  /** Parsed `scheme://host:port` listen URL (reference `main.go:207-213` —
    * url.Parse over each comma-separated element). Empty host binds
    * loopback; scheme must be one of the reference's three.
    */
  private[streaming] final case class ListenUrl(scheme: String, host: String, port: Int)
  private[streaming] def parseListen(listen: String): Seq[ListenUrl] = {
    require(listen.nonEmpty, "empty listen list")
    listen.split(',').toIndexedSeq.map(_.trim).map { u =>
      val i = u.indexOf("://")
      require(i > 0, s"could not parse listen address '$u' (want scheme://host:port)")
      val scheme = u.substring(0, i)
      require(Set("sflow", "netflow", "nfl").contains(scheme),
        s"unknown scheme '$scheme' in '$u' (main.go:241 parity: sflow|netflow|nfl)")
      val rest = u.substring(i + 3)
      // IPv6 hosts must be bracketed ([::1]:6343) like Go's url.Parse; a
      // bare multi-colon host (sflow://::1:6343) would silently mis-split
      // on lastIndexOf(':'), so refuse it at parse time with the fix named
      val (host, portStr) =
        if (rest.startsWith("[")) {
          val close = rest.indexOf(']')
          require(close > 0 && close < rest.length - 1 && rest(close + 1) == ':',
            s"malformed IPv6 listen address '$u' (want scheme://[addr]:port)")
          (rest.substring(1, close), rest.substring(close + 2))
        } else {
          val c = rest.lastIndexOf(':')
          require(c >= 0 && c < rest.length - 1, s"missing port in '$u'")
          require(rest.indexOf(':') == c,
            s"ambiguous IPv6 host in '$u' — bracket it: $scheme://[${rest.substring(0, c)}]:${rest.substring(c + 1)}")
          (rest.substring(0, c), rest.substring(c + 1))
        }
      val port = portStr.toInt
      ListenUrl(scheme, if (host.isEmpty) "127.0.0.1" else host, port)
    }
  }

  /** Wait until every named UDP source of `q` reports a bound port; a
    * query that dies during startup surfaces ITS error immediately
    * instead of a misleading bind-timeout after 30 s.
    */
  private def awaitBound(q: StreamingQuery, names: Seq[String]): Map[String, Int] = {
    val deadline = System.nanoTime() + 30_000_000_000L
    var ports = Map.empty[String, Int]
    while (ports.size < names.size && System.nanoTime() < deadline) {
      if (!q.isActive) throw q.exception
        .map(e => new IllegalStateException(
          "collector query failed during startup", e))
        .getOrElse(new IllegalStateException(
          "collector query stopped during startup"))
      ports = names.flatMap(n =>
        UdpFlowSource.boundPort(n).map(n -> _)).toMap
      if (ports.size < names.size) Thread.sleep(20)
    }
    require(ports.size == names.size,
      s"UDP listeners failed to bind: ${names.filterNot(ports.contains).mkString(",")}")
    ports
  }

  /** Reference CLI parity (`-listen sflow://:6343,netflow://:2055`,
    * `main.go:31,207-256`): one socket PER comma-separated URL, each
    * restricted to its scheme (wrong-version datagrams count as that
    * listener's drops, like goflow's per-state decoders), fanned in via
    * `unionByName` (R2) to one normalized stream and one sink. Counters
    * are labeled per listener on /metrics
    * (`graft_udp_listener_*_total{listener="<name>-<scheme>-<i>"}`).
    * Port 0 = ephemeral; the actual binds come back in
    * [[Running.listeners]].
    *
    * `persistTemplates` (opt-in, r10): persist each listener's v9/IPFIX
    * template + sampling-rate registry beside the query checkpoint (via
    * the checkpoint's Hadoop FileSystem), so a RESTARTED collector decodes
    * data records arriving before the exporter's next periodic template
    * re-export. Default OFF = RFC 3954 §5 wait-for-re-export (goflow
    * parity; a restart counts pre-announcement data in template_misses
    * until re-announcement — both behaviors are spec-pinned in
    * UdpIngestSpec).
    */
  def startUrls(spark: SparkSession, listen: String, outDir: String,
      checkpoint: String, name: String = "collector", metricsPort: Int = 0,
      batchMaxTime: String = "10 seconds", maxPacketsPerBatch: Long = 1000L,
      numPartitions: Int = 4, extended: Boolean = false,
      persistTemplates: Boolean = false): Running = {
    val urls = parseListen(listen)
    val named = urls.zipWithIndex.map { case (u, i) =>
      (u, s"$name-${u.scheme}-$i")
    }
    val listener = new FlowPipeline.MetricsListener
    spark.streams.addListener(listener)
    var server: MetricsServer = null
    var q: StreamingQuery = null
    try {
      server = new MetricsServer(listener, metricsPort)
      val raw = named.map { case (u, n) =>
        spark.readStream.format("nflv5-udp")
          .option("host", u.host).option("port", u.port)
          .option("name", n).option("scheme", u.scheme)
          .option("maxPacketsPerBatch", maxPacketsPerBatch)
          .option("numPartitions", numPartitions)
          .option("extended", extended)
          .option("persistTemplates", persistTemplates)
          .load()
      }.reduce(_ unionByName _)
      q = FlowPipeline.start(FlowPipeline.normalize(raw), outDir, checkpoint,
        batchMaxTime)
      val ports = awaitBound(q, named.map(_._2))
      val bound = named.map { case (u, n) => Listener(n, u.scheme, u.host, ports(n)) }
      Running(q, listener, server, bound.head.port, bound)
    } catch {
      case e: Throwable =>
        if (q != null) { try q.stop() catch { case _: Exception => () } }
        spark.streams.removeListener(listener)
        if (server != null) { try server.stop() catch { case _: Exception => () } }
        throw e
    }
  }

  /** Start the collector; blocks only until the UDP port is bound. */
  def start(spark: SparkSession, outDir: String, checkpoint: String,
      udpPort: Int = 0, name: String = "collector", metricsPort: Int = 0,
      batchMaxTime: String = "10 seconds", maxPacketsPerBatch: Long = 1000L,
      numPartitions: Int = 4, extended: Boolean = false,
      persistTemplates: Boolean = false): Running = {
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
        .option("extended", extended)
        .option("persistTemplates", persistTemplates)
        .load()
      q = FlowPipeline.start(FlowPipeline.normalize(raw), outDir, checkpoint,
        batchMaxTime)
      val port = awaitBound(q, Seq(name))(name)
      Running(q, listener, server, port,
        Seq(Listener(name, "any", "127.0.0.1", port)))
    } catch {
      case e: Throwable =>
        if (q != null) { try q.stop() catch { case _: Exception => () } }
        spark.streams.removeListener(listener)
        if (server != null) { try server.stop() catch { case _: Exception => () } }
        throw e
    }
  }
}
