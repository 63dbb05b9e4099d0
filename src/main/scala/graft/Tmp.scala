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
    * forever); the reap is age-gated at 30 minutes of mtime quiet so a
    * concurrently running session's live directory — the very collision
    * the appId scoping exists to prevent — is never deleted from under
    * it.
    */
  def sessionDir(s: org.apache.spark.sql.SparkSession, tag: String): String = {
    val parent = new java.io.File(root, tag)
    val mine = s.sparkContext.applicationId
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName != mine &&
        f.lastModified < System.currentTimeMillis() - 30L * 60 * 1000)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    new java.io.File(parent, mine).getAbsolutePath
  }
}
