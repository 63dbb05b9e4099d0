package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time attribution for a registered BATCH query (r18
  * optimization round, guide §1: measure first). Runs the registered body
  * once warm (JIT + codegen + FS cache), once measured, with a
  * SparkListener recording every job's wall span, task count, summed task
  * time, shuffle bytes, and the first stage's call site — the code line
  * that submitted the job. The gap between summed job spans and the wall
  * is driver-side work (planning, collect decode, checkpoint bookkeeping).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileBatch <query> [query ...]"
  */
object ProfileBatch {

  final case class JobRow(jobId: Int, site: String, wallMs: Long,
    tasks: Int, taskTimeMs: Long, shuffleReadMB: Double, desc: String)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileBatch <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobStart = mutable.Map.empty[Int, (Long, String, String)]
    val stageOfJob = mutable.Map.empty[Int, Int]
    val stageInfo = mutable.Map.empty[Int, (Int, Long, Double)] // tasks, taskTime, shuffleReadMB
    val rows = mutable.Buffer.empty[JobRow]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val site = e.stageInfos.headOption.map(_.details.linesIterator
          .find(_.contains("graft")).getOrElse("").trim).getOrElse("")
        val callsite = e.stageInfos.lastOption.map(_.name).getOrElse("")
        jobStart(e.jobId) = (System.nanoTime(),
          if (site.nonEmpty) site else callsite,
          Option(e.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse(""))
        e.stageIds.foreach(sid => stageOfJob(sid) = e.jobId)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = e.stageInfo
          stageInfo(si.stageId) = (si.numTasks,
            si.taskMetrics.executorRunTime,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobStart.remove(e.jobId).foreach { case (t0, site, desc) =>
          val sids = stageOfJob.filter(_._2 == e.jobId).keys
          val infos = sids.flatMap(stageInfo.get)
          // rows is read/cleared by the main thread under rows' own
          // monitor — use the SAME lock here (ADVICE r18: the listener
          // callbacks held the listener's monitor instead, so there was
          // no mutual exclusion with the main thread at all)
          rows.synchronized {
            rows += JobRow(e.jobId, site,
              (System.nanoTime() - t0) / 1000000L,
              infos.map(_._1).sum, infos.map(_._2).sum,
              infos.map(_._3).sum, desc)
          }
        }
      }
    }

    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      spark.sparkContext.addSparkListener(listener)
      rows.synchronized(rows.clear())
      val wall = once()
      Thread.sleep(300) // let the listener bus drain the final job-end events
      spark.sparkContext.removeSparkListener(listener)
      val rs = rows.synchronized(rows.toVector)
      println(f"\n== $name wall ${wall}%.3f s, ${rs.size} jobs, " +
        f"sum job wall ${rs.map(_.wallMs).sum / 1000.0}%.3f s, " +
        f"driver gap ${wall - rs.map(_.wallMs).sum / 1000.0}%.3f s ==")
      println("  wallMs tasks taskTimeMs shufMB  site")
      rs.sortBy(-_.wallMs).take(30).foreach { r =>
        // the §1.5 job description, when set, names the phase far better
        // than the submitting call site (AQE stage jobs all share the
        // withThreadLocalCaptured site)
        val label = (if (r.desc.nonEmpty) r.desc else r.site)
          .replace('\n', ' ') // streaming batch descriptions are multi-line
        println(f"  ${r.wallMs}%6d ${r.tasks}%5d ${r.taskTimeMs}%10d " +
          f"${r.shuffleReadMB}%6.1f  ${label.take(90)}%s")
      }
    }
    spark.stop()
  }
}
