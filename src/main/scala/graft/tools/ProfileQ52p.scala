package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One-off profiler for q52p's drain cost (VERDICT r17 #1 / r16 #6): the
  * 50 ms trigger landed but min-of-sweeps moved only 3.85 → 3.61 s, so
  * ~3.5 s is unattributed. This main runs the REGISTERED q52p body with a
  * StreamingQueryListener attached and prints, per micro-batch: input
  * rows, every `durationMs` phase the engine reports (addBatch,
  * walCommit, commitOffsets, queryPlanning, getBatch, latestOffset,
  * triggerExecution), and the state operator's commit/update times — then
  * the aggregate attribution: how much of the wall is execution vs
  * trigger-idle vs post-drain batch work (window + z-norm/PAA + kNN).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ52p"
  */
object ProfileQ52p {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val queryName = args.headOption.getOrElse("q52p_stream_series_recent")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class P(batchId: Long, rows: Long, wallMs: Long,
      dur: Map[String, Long], stateCommitMs: Long, stateUpdateMs: Long,
      stateRemovalMs: Long, stateRowsTotal: Long, tsMs: Long)
    val events = mutable.Buffer.empty[P]
    val lastSources = new java.util.concurrent.atomic.AtomicReference[String]("")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = {
          val it = p.durationMs.entrySet().iterator()
          val m = mutable.Map.empty[String, Long]
          while (it.hasNext) { val en = it.next(); m(en.getKey) = en.getValue }
          m.toMap
        }
        val so = p.stateOperators.headOption
        lastSources.set(p.sources.map(sp =>
          s"desc=${sp.description.take(40)} start=${sp.startOffset} " +
            s"end=${sp.endOffset} latest=${sp.latestOffset}").mkString(" | "))
        events.synchronized {
          events += P(p.batchId, p.numInputRows,
            dur.getOrElse("triggerExecution", 0L), dur,
            so.map(_.commitTimeMs).getOrElse(0L),
            so.map(_.allUpdatesTimeMs).getOrElse(0L),
            so.map(_.allRemovalsTimeMs).getOrElse(0L),
            so.map(_.numRowsTotal).getOrElse(0L),
            java.time.Instant.parse(p.timestamp).toEpochMilli)
        }
      }
    }
    spark.streams.addListener(listener)

    // one warm run (JIT + codegen), then the measured run — mirrors the
    // bench's min-of-sweeps posture without 3 full sweeps
    def once(): Double = {
      events.synchronized(events.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(queryName)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    val wallSec = once()

    val ps = events.synchronized(events.toVector).sortBy(_.tsMs)
    println(f"== $queryName total wall: $wallSec%.3f s, ${ps.size} micro-batches ==")
    println(s"last-source offsets: ${lastSources.get()}")
    val durKeys = ps.flatMap(_.dur.keys).distinct.sorted
    println("batch  rows  " + durKeys.map(k => f"$k%-16s").mkString +
      "stCommit stUpdate stRemoval stRows")
    ps.foreach { p =>
      println(f"${p.batchId}%5d ${p.rows}%5d  " +
        durKeys.map(k => f"${p.dur.getOrElse(k, -1L)}%-16d").mkString +
        f"${p.stateCommitMs}%8d ${p.stateUpdateMs}%8d ${p.stateRemovalMs}%9d ${p.stateRowsTotal}%6d")
    }
    val sumTrig = ps.map(_.dur.getOrElse("triggerExecution", 0L)).sum
    val sumAdd = ps.map(_.dur.getOrElse("addBatch", 0L)).sum
    val sumWal = ps.map(_.dur.getOrElse("walCommit", 0L)).sum
    val sumOff = ps.map(_.dur.getOrElse("commitOffsets", 0L)).sum
    val sumPlan = ps.map(_.dur.getOrElse("queryPlanning", 0L)).sum
    val sumCommit = ps.map(_.stateCommitMs).sum
    val span = if (ps.nonEmpty) (ps.last.tsMs + ps.last.wallMs - ps.head.tsMs) / 1000.0 else 0.0
    val dataBatches = ps.count(_.rows > 0)
    println(f"""
      |attribution (measured run):
      |  micro-batches          ${ps.size} ($dataBatches with data)
      |  Σ triggerExecution     ${sumTrig / 1000.0}%.3f s
      |    Σ addBatch           ${sumAdd / 1000.0}%.3f s
      |    Σ walCommit          ${sumWal / 1000.0}%.3f s
      |    Σ commitOffsets      ${sumOff / 1000.0}%.3f s
      |    Σ queryPlanning      ${sumPlan / 1000.0}%.3f s
      |    Σ state commitTimeMs ${sumCommit / 1000.0}%.3f s (inside addBatch)
      |  stream span (first ts → last end) $span%.3f s
      |  trigger idle inside span          ${span - sumTrig / 1000.0}%.3f s
      |  post-drain batch work (kNN etc.)  ${wallSec - span}%.3f s (approx: wall − span; includes startup)
      |""".stripMargin)
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
