package graft.sources

import java.net.HttpURLConnection

import org.scalatest.funsuite.AnyFunSuite

/** Real-ClickHouse gate (conditional): run the emitted DDL against the
  * same server image the reference ships (`/root/reference/run_db:3`,
  * clickhouse-server 24.12) and prove a typed insert round-trips — the
  * golden-file check (ClickHouseDdlSpec) pins the TEXT, this proves the
  * text EXECUTES.
  *
  * The test cancels (never fails) when no docker daemon or image is
  * available: this environment ships a docker client but no daemon and
  * has zero egress, so the gate runs wherever `docker run` works and
  * skips deterministically here.
  *
  * Documented waiver: the JDBC idempotent-append guard cannot run against
  * ClickHouse in this offline environment (no ClickHouse JDBC driver on
  * the classpath, and none resolvable) — the full-row-multiset guard is
  * plain-JDBC, engine-agnostic logic and is proven end-to-end against
  * Derby in JdbcIdempotentSpec; this spec covers the ClickHouse-specific
  * surface: DDL executability, Null-engine insert acceptance, and
  * UInt64/typed round-trips over the native HTTP interface.
  */
class ClickHouseGateSpec extends AnyFunSuite {

  private val Image = "clickhouse/clickhouse-server:24.12-alpine"

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = if (p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)) p.exitValue()
             else { p.destroyForcibly(); -1 }
    (rc, out)
  }

  private def http(port: Int, sql: String): (Int, String) = {
    val conn = new java.net.URI(s"http://127.0.0.1:$port/")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    conn.getOutputStream.write(sql.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val body = new String(
      (if (code < 400) conn.getInputStream else conn.getErrorStream).readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("emitted flows DDL executes on ClickHouse 24.12 and typed inserts round-trip") {
    assume(run("docker", "info")._1 == 0,
      "docker daemon unavailable — real-ClickHouse gate skipped")
    assume(run("docker", "image", "inspect", Image)._1 == 0,
      s"$Image not in the local image cache (no egress) — gate skipped")

    val (rc, cidOut) = run("docker", "run", "-d", "--rm",
      "--ulimit", "nofile=262144:262144", "-p", "127.0.0.1::8123", Image)
    assert(rc == 0, s"docker run failed: $cidOut")
    val cid = cidOut.trim
    try {
      val (prc, portOut) = run("docker", "port", cid, "8123/tcp")
      assert(prc == 0, portOut)
      val port = portOut.trim.split(':').last.toInt
      val deadline = System.nanoTime() + 120_000_000_000L
      var up = false
      while (!up && System.nanoTime() < deadline) {
        up = try http(port, "SELECT 1")._1 == 200 catch { case _: Exception => false }
        if (!up) Thread.sleep(250)
      }
      assert(up, "clickhouse never answered /")

      // 1. the DDL this engine emits, executed verbatim
      val (dc, dBody) = http(port, ClickHouseDdl.flowsDdl.stripSuffix(";\n"))
      assert(dc == 200, s"DDL rejected: $dBody")
      // Null engine: inserts are accepted, nothing stored (fan-out head)
      val insertCols = graft.FlowSchema.chTypes.map(_._1).mkString(", ")
      def row(seq: Long, bytes: BigInt): String =
        graft.FlowSchema.chTypes.map {
          case ("sequence_num", _) => seq.toString
          case ("bytes", _) => bytes.toString
          case (_, "String") => "'10.0.0.1'"
          case (_, "Int32") => "1"
          case _ => "1"
        }.mkString("(", ", ", ")")
      val (nc, nBody) = http(port,
        s"INSERT INTO flows ($insertCols) VALUES ${row(1L, BigInt(1))}")
      assert(nc == 200, s"Null-engine insert rejected: $nBody")
      assert(http(port, "SELECT count() FROM flows")._2.trim == "0")

      // 2. a MergeTree mirror of the same columns proves the TYPES store
      // and round-trip — incl. a UInt64 beyond Int64 range (qf7's widening
      // concern is real on the wire, not just in the DDL text)
      val mirror = ClickHouseDdl.flowsDdl
        .replace("CREATE TABLE IF NOT EXISTS flows", "CREATE TABLE flows_store")
        .replace("ENGINE = Null();", "ENGINE = MergeTree() ORDER BY sequence_num;")
      val (mc, mBody) = http(port, mirror.stripSuffix(";\n"))
      assert(mc == 200, s"mirror DDL rejected: $mBody")
      val big = BigInt("18446744073709551615") // UInt64 max
      val (ic, iBody) = http(port, s"INSERT INTO flows_store ($insertCols) VALUES " +
        s"${row(1L, BigInt(1))}, ${row(2L, big)}")
      assert(ic == 200, s"typed insert rejected: $iBody")
      assert(http(port, "SELECT count() FROM flows_store")._2.trim == "2")
      assert(http(port,
        "SELECT bytes FROM flows_store WHERE sequence_num = 2")._2.trim == big.toString)
    } finally run("docker", "rm", "-f", cid)
  }
}
