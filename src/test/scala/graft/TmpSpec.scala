package graft

/** Pins the session-scratch reap contract (ADVICE r13): liveness is the
  * `.alive` heartbeat file, not any content mtime — a session that wrote
  * its store hours ago but still reads it must never lose it to a newer
  * session's reap sweep, and a genuinely dead sibling must go.
  */
class TmpSpec extends SparkSpec {

  private def mkSibling(tag: String, name: String, hbAgeMs: Long): java.io.File = {
    val d = new java.io.File(new java.io.File(Tmp.root, tag), name)
    d.mkdirs()
    new java.io.File(d, "store.parquet").createNewFile()
    val hb = new java.io.File(d, ".alive")
    hb.createNewFile()
    hb.setLastModified(System.currentTimeMillis() - hbAgeMs)
    // content mtime far in the past — the old subtree-mtime gate would
    // have keyed on this
    new java.io.File(d, "store.parquet")
      .setLastModified(System.currentTimeMillis() - 9L * 3600 * 1000)
    d.setLastModified(System.currentTimeMillis() - 9L * 3600 * 1000)
    d
  }

  test("a fresh heartbeat protects a sibling whose content is hours old") {
    val tag = "tmpspec-live"
    val live = mkSibling(tag, "app-other-live", hbAgeMs = 60 * 1000)
    Tmp.sessionDir(spark, tag)
    assert(live.exists(), "sibling with a fresh .alive was reaped")
  }

  test("a stale heartbeat gets the sibling reaped; the claimed dir is touched") {
    val tag = "tmpspec-stale"
    val dead = mkSibling(tag, "app-other-dead", hbAgeMs = 3L * 3600 * 1000)
    val mine = Tmp.sessionDir(spark, tag)
    assert(!dead.exists(), "sibling with a 3h-old .alive survived the sweep")
    assert(new java.io.File(mine, ".alive").exists(),
      "the claimed dir must carry its own heartbeat")
  }
}
