package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.IpUtil

/** R3 projection helpers (`main.go:133-139` parity): rendering, parsing,
  * CIDR membership — unit cases plus property round-trips.
  */
class IpUtilSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  test("bytesToIpString renders IPv4 dotted quad") {
    assert(IpUtil.bytesToIpString(Array[Byte](10, 0, 0, 1)) == "10.0.0.1")
    assert(IpUtil.bytesToIpString(Array[Byte](-1, -1, -1, -1)) == "255.255.255.255")
  }

  test("bytesToIpString renders IPv6 colon form") {
    val b = new Array[Byte](16)
    b(15) = 1
    assert(IpUtil.bytesToIpString(b) == "0:0:0:0:0:0:0:1")
  }

  test("bytesToIpString renders v4-mapped IPv6 as dotted quad (Go parity)") {
    val b = new Array[Byte](16)
    b(10) = -1; b(11) = -1
    b(12) = 10; b(13) = 1; b(14) = 2; b(15) = 3
    assert(IpUtil.bytesToIpString(b) == "10.1.2.3")
    // ...but only the exact ::ffff:0:0/96 prefix: any nonzero high byte or
    // non-ff bytes 10-11 fall back to colon form
    val c = b.clone(); c(0) = 1
    assert(IpUtil.bytesToIpString(c) == "100:0:0:0:0:ffff:a01:203")
    val e = b.clone(); e(11) = 0
    assert(IpUtil.bytesToIpString(e) == "0:0:0:0:0:ff00:a01:203")
  }

  test("property: v4-mapped render equals the embedded IPv4 render") {
    check(Prop.forAll(ipGen) { v =>
      val q = Array[Byte](
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val mapped = new Array[Byte](16)
      mapped(10) = -1; mapped(11) = -1
      System.arraycopy(q, 0, mapped, 12, 4)
      IpUtil.bytesToIpString(mapped) == IpUtil.bytesToIpString(q)
    })
  }

  test("bytesToIpString rejects bad lengths and null") {
    assert(IpUtil.bytesToIpString(null) == null)
    assert(IpUtil.bytesToIpString(Array[Byte](1, 2, 3)) == null)
  }

  test("ipv4ToLong parses and rejects") {
    assert(IpUtil.ipv4ToLong("10.0.0.1") == (10L << 24 | 1))
    assert(IpUtil.ipv4ToLong("255.255.255.255") == 0xffffffffL)
    assert(IpUtil.ipv4ToLong("0.0.0.0") == 0L)
    assert(IpUtil.ipv4ToLong("256.0.0.1") == -1L)
    assert(IpUtil.ipv4ToLong("1.2.3") == -1L)
    assert(IpUtil.ipv4ToLong("1.2.3.4.5") == -1L)
    assert(IpUtil.ipv4ToLong("a.b.c.d") == -1L)
    assert(IpUtil.ipv4ToLong("") == -1L)
    assert(IpUtil.ipv4ToLong(null) == -1L)
  }

  test("ipv4ToLong is strict: canonical quads only (Go net.ParseIP parity)") {
    // leading zeros rejected — the accepted language must equal the output
    // language of bytesToIpString, which is what makes the CidrPushdown
    // prefix rewrites exact
    assert(IpUtil.ipv4ToLong("010.1.2.3") == -1L)
    assert(IpUtil.ipv4ToLong("10.01.2.3") == -1L)
    assert(IpUtil.ipv4ToLong("1.2.3.00") == -1L)
    assert(IpUtil.ipv4ToLong("00.0.0.0") == -1L)
    assert(IpUtil.ipv4ToLong("1.2.3.4 ") == -1L)
    assert(IpUtil.ipv4ToLong(" 1.2.3.4") == -1L)
  }

  test("ipInCidr membership basics") {
    assert(IpUtil.ipInCidr(u("10.1.2.3"), u("10.0.0.0/8")))
    assert(!IpUtil.ipInCidr(u("11.1.2.3"), u("10.0.0.0/8")))
    assert(IpUtil.ipInCidr(u("192.168.5.1"), u("192.168.0.0/16")))
    assert(IpUtil.ipInCidr(u("1.2.3.4"), u("0.0.0.0/0")))
    assert(IpUtil.ipInCidr(u("1.2.3.4"), u("1.2.3.4/32")))
    assert(!IpUtil.ipInCidr(u("1.2.3.5"), u("1.2.3.4/32")))
    assert(!IpUtil.ipInCidr(u("1.2.3.4"), u("bogus")))
    assert(!IpUtil.ipInCidr(u("1.2.3.4"), u("1.2.3.4/33")))
    assert(!IpUtil.ipInCidr(null, u("10.0.0.0/8")))
  }

  private val ipGen: Gen[Long] = Gen.chooseNum(0L, 0xffffffffL)

  test("property: long -> bytes -> string -> long round-trips") {
    check(Prop.forAll(ipGen) { v =>
      val b = Array[Byte](
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      IpUtil.ipv4ToLong(IpUtil.bytesToIpString(b)) == v
    })
  }

  test("property: ipInCidr agrees with mask arithmetic") {
    check(Prop.forAll(ipGen, ipGen, Gen.chooseNum(0, 32)) { (ip, base, len) =>
      val mask = if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL
      val expected = (ip & mask) == (base & mask)
      def s(v: Long) = s"${(v >> 24) & 0xff}.${(v >> 16) & 0xff}.${(v >> 8) & 0xff}.${v & 0xff}"
      IpUtil.ipInCidr(u(s(ip)), u(s"${s(base)}/$len")) == expected
    })
  }

  test("IpRender expression matches bytesToIpString under codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases: Seq[Array[Byte]] = Seq(
      Array[Byte](10, 0, 0, 1),
      Array[Byte](-1, -1, -1, -1),
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, -1, 10, 1, 2, 3), // v4-mapped
      (0 until 16).map(i => i.toByte).toArray, // plain v6
      Array[Byte](1, 2, 3), // bad length → null
      null)
    val got = cases.toDF("b")
      .select(graft.functions.IpFunctions.ip_render(col("b")).as("s"))
      .collect().map(r => Option(r.getString(0)))
    val want = cases.map(b => Option(IpUtil.bytesToIpString(b)))
    assert(got.toSeq == want)
  }

  test("ip_render / ip_to_bytes are callable from SQL via injected functions") {
    val r = spark.sql(
      "SELECT ip_render(ip_to_bytes(CAST(167772161 AS BIGINT))) AS a, ip_render(CAST(NULL AS BINARY)) AS n")
      .head()
    assert(r.getString(0) == "10.0.0.1")
    assert(r.isNullAt(1))
  }

  test("property: IpToBytes ≡ ipBytes and round-trips through IpRender") {
    check(Prop.forAll(ipGen) { v =>
      val b = IpUtil.ipBytes(v)
      java.util.Arrays.equals(b, Array[Byte](
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)) &&
        IpUtil.ipv4ToLong(IpUtil.renderIp(b).toString) == v
    })
  }
}
