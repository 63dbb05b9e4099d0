package graft

/** The ONE scratch root every query/bench helper derives its temp paths
  * from (ADVICE r11: x3k hardcoded an absolute `/root/repo/target` literal,
  * which both breaks relocated checkouts and races two concurrent sessions
  * on the same directory). Resolved once per JVM from the working directory
  * (sbt runs at the repo root) or `GRAFT_TMP_DIR`; callers that write
  * session-scoped artifacts additionally suffix
  * `SparkContext.applicationId` so concurrent sessions never share a path.
  */
object Tmp {
  val root: String = new java.io.File(
    sys.env.getOrElse("GRAFT_TMP_DIR", "target/graft-tmp")).getAbsolutePath

  /** Directories this JVM owns; a daemon timer keeps their heartbeat
    * files fresh so siblings never reap a live session (see below).
    */
  private val owned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()

  private def touchAlive(dir: java.io.File): Unit = {
    dir.mkdirs()
    val hb = new java.io.File(dir, ".alive")
    if (!hb.createNewFile()) hb.setLastModified(System.currentTimeMillis())
  }

  private lazy val heartbeat: java.util.Timer = {
    val t = new java.util.Timer("graft-tmp-heartbeat", /*isDaemon*/ true)
    t.scheduleAtFixedRate(new java.util.TimerTask {
      override def run(): Unit = owned.forEach(d => touchAlive(d))
    }, HeartbeatMs, HeartbeatMs)
    t
  }

  private val HeartbeatMs = 5L * 60 * 1000
  private val ReapAfterMs = 2L * 3600 * 1000

  /** A session-scoped scratch dir `<root>/<tag>/<applicationId>` for
    * artifacts that must not be shared across concurrent JVMs (Derby
    * databases, streaming sinks/checkpoints, persisted index stores).
    * Before handing the path out, STALE sibling sessions are reaped
    * (ADVICE r12: appId-scoped dirs otherwise accumulate one per JVM run
    * forever). Liveness is a HEARTBEAT file `<dir>/.alive` touched every
    * 5 min by a daemon timer for every dir this JVM has claimed (ADVICE
    * r13: the previous subtree-newest-mtime gate missed a session that
    * wrote its store early and only READ it hours later — reads don't
    * move any mtime — and paid a full recursive walk over every sibling
    * store on each call). A sibling is reaped only when its heartbeat
    * (or, for dirs predating the heartbeat, the dir's own mtime) is
    * > 2 h old — a live session's is at most 5 min old.
    */
  def sessionDir(s: org.apache.spark.sql.SparkSession, tag: String): String = {
    val parent = new java.io.File(root, tag)
    val mine = new java.io.File(parent, s.sparkContext.applicationId)
    val cutoff = System.currentTimeMillis() - ReapAfterMs
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter { f =>
        val hb = new java.io.File(f, ".alive")
        f.getName != mine.getName &&
          (if (hb.exists()) hb.lastModified else f.lastModified) < cutoff
      }
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    touchAlive(mine)
    if (owned.add(mine)) heartbeat // force the lazy timer on first claim
    mine.getAbsolutePath
  }
}
