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

  /** A session-scoped scratch dir `<root>/<tag>/<applicationId>` for
    * artifacts that must not be shared across concurrent JVMs (Derby
    * databases, streaming sinks/checkpoints, persisted index stores).
    * Before handing the path out, STALE sibling sessions are reaped
    * (ADVICE r12: appId-scoped dirs otherwise accumulate one per JVM run
    * forever); the reap is age-gated at 2 hours of SUBTREE-mtime quiet so
    * a concurrently running session's live directory — the very collision
    * the appId scoping exists to prevent — is never deleted from under
    * it (r13: the gate was the top-level dir's 30-min mtime, but a dir's
    * mtime freezes once writes land deeper, so a long session's live
    * store could be reaped mid-run).
    */
  def sessionDir(s: org.apache.spark.sql.SparkSession, tag: String): String = {
    val parent = new java.io.File(root, tag)
    val mine = s.sparkContext.applicationId
    // quiet = NEWEST mtime anywhere in the subtree (a directory's own
    // mtime freezes once writes land deeper — frag/batch dirs, parquet
    // parts — so the top-level mtime says nothing about liveness), and
    // the threshold is 2 h: far beyond any phase gap inside one session
    // (a full bench is ~20 min; a gate rereads its tier artifact within
    // minutes) while still reaping across rounds.
    def newestMtime(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified +: Option(f.listFiles()).getOrElse(Array.empty)
          .map(newestMtime).toSeq).max
      else f.lastModified
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName != mine &&
        newestMtime(f) < System.currentTimeMillis() - 2L * 3600 * 1000)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    new java.io.File(parent, mine).getAbsolutePath
  }
}
