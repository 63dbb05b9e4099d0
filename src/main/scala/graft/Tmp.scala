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
}
