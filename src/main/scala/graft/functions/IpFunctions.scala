package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IP helpers for the R3 projection (the reference renders `[]byte`
  * addresses to strings at `main.go:133-139` via `net.IP(...).String()`)
  * and CIDR predicates over the rendered form.
  *
  * Static, JVM-wide helpers — callable from interpreted eval AND from
  * generated Java (whole-stage codegen) via the object's static forwarders.
  */
object IpUtil {
  /** 4-byte → dotted quad; 16-byte v4-mapped (::ffff:a.b.c.d) → dotted quad
    * of the low 4 bytes, like Go's `net.IP.String()` behind the reference's
    * renderer (`main.go:133-139`) — NetFlow v9/IPFIX exporters routinely
    * carry IPv4 in 16-byte fields this way; other 16-byte → colon form
    * (lowercase hex, no zero-run compression — deterministic; Go does
    * compress, but nothing downstream depends on the compressed form).
    */
  def bytesToIpString(b: Array[Byte]): String =
    if (b == null) null
    else if (b.length == 4)
      s"${b(0) & 0xff}.${b(1) & 0xff}.${b(2) & 0xff}.${b(3) & 0xff}"
    else if (b.length == 16) {
      var v4mapped = b(10) == -1 && b(11) == -1
      var i = 0
      while (v4mapped && i < 10) { v4mapped = b(i) == 0; i += 1 }
      if (v4mapped)
        s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
      else
        (0 until 8).map(i => f"${((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff)}%x")
          .mkString(":")
    } else null

  /** Canonical dotted-quad string → unsigned 32-bit value in a long; -1 on
    * malformed input (no allocation, single pass). Strict: octets with
    * leading zeros ("010") are rejected, like Go's `net.ParseIP` (≥ 1.17)
    * behind the reference's renderer — so the accepted language is exactly
    * the output language of [[bytesToIpString]], which is what makes the
    * CidrPushdown prefix rewrites provably exact.
    */
  def ipv4ToLong(str: String): Long = {
    if (str == null) return -1L
    var acc = 0L
    var octet = -1L
    var digits = 0
    var parts = 0
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '.') {
        if (octet < 0 || parts >= 3) return -1L
        acc = (acc << 8) | octet; octet = -1L; digits = 0; parts += 1
      } else if (c >= '0' && c <= '9') {
        if (digits > 0 && octet == 0L) return -1L // leading zero
        octet = (if (octet < 0) 0L else octet) * 10 + (c - '0')
        digits += 1
        if (octet > 255) return -1L
      } else return -1L
      i += 1
    }
    if (octet < 0 || parts != 3) return -1L
    (acc << 8) | octet
  }

  /** True iff dotted-quad `addr` lies inside `cidr` ("a.b.c.d/len"). */
  def ipInCidr(addr: UTF8String, cidr: UTF8String): Boolean = {
    if (addr == null || cidr == null) return false
    val c = cidr.toString
    val slash = c.indexOf('/')
    if (slash < 0) return false
    val base = ipv4ToLong(c.substring(0, slash))
    val ip = ipv4ToLong(addr.toString)
    if (base < 0 || ip < 0) return false
    val len =
      try c.substring(slash + 1).toInt
      catch { case _: NumberFormatException => return false }
    if (len < 0 || len > 32) return false
    val mask = if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL
    (ip & mask) == (base & mask)
  }

  /** [[bytesToIpString]] in UTF8String form — the codegen entry point for
    * [[graft.functions.IpRender]] (null for unrenderable lengths).
    */
  def renderIp(b: Array[Byte]): UTF8String =
    UTF8String.fromString(bytesToIpString(b))

  /** Low 32 bits of a long → 4 network-order bytes (the reference's
    * in-flight `[]byte` address form) — codegen entry point for
    * [[graft.functions.IpToBytes]].
    */
  def ipBytes(v: Long): Array[Byte] = Array[Byte](
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
}

/** Codegen-native IP renderer `ip_render(bytes)` — the R3 projection's hot
  * expression (`main.go:133-139`: three renderings per row at ingest rate).
  * As a Catalyst Expression it keeps the whole normalize projection inside
  * one WholeStageCodegen span; the Scala-UDF form ([[IpFunctions
  * .bytesToIpString]]) remains only as the declared Q54 UDF-surface demo.
  * Returns null for byte lengths other than 4/16 (and for null input).
  */
case class IpRender(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "ip_render"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip_render requires BINARY input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(b: Any): Any =
    IpUtil.renderIp(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = graft.functions.IpUtil.renderIp($b);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-native `ip_to_bytes(long)` — synthesizes the in-flight 4-byte
  * address form from an unsigned-32-in-long value; pairs with [[IpRender]]
  * so the R3-parity chain is expressible without leaving codegen.
  */
case class IpToBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ip_to_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip_to_bytes requires BIGINT input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    IpUtil.ipBytes(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.IpUtil.ipBytes($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen-capable CIDR-membership predicate `ip_in_cidr(addr, cidr)` — a
  * native Catalyst Expression (SURVEY §7.3 upgrade path for the Q54 UDF):
  * it stays inside whole-stage codegen instead of breaking the generated
  * pipeline at a black-box Scala UDF, and null-propagates like a built-in.
  */
case class IpInCidr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "ip_in_cidr"

  override protected def nullSafeEval(addr: Any, cidr: Any): Any =
    IpUtil.ipInCidr(addr.asInstanceOf[UTF8String], cidr.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, c) => s"graft.functions.IpUtil.ipInCidr($a, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IpFunctions {
  /** R3 projection UDF (`main.go:133`): flow address bytes → string. */
  val bytesToIpString = udf((b: Array[Byte]) => IpUtil.bytesToIpString(b))

  /** Long (low 32 bits) → 4 network-order bytes — synthesizes the
    * reference's in-flight `[]byte` address form.
    */
  val longToIpBytes = udf((v: Long) => Array[Byte](
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte))

  /** Column API for the codegen CIDR predicate. */
  def ip_in_cidr(addr: Column, cidr: Column): Column =
    Shim.column(IpInCidr(Shim.expression(addr), Shim.expression(cidr)))

  /** Column API for the codegen IP renderer (native [[IpRender]]). */
  def ip_render(bytes: Column): Column =
    Shim.column(IpRender(Shim.expression(bytes)))

  /** Column API for the codegen long→bytes address synthesizer. */
  def ip_to_bytes(v: Column): Column =
    Shim.column(IpToBytes(Shim.expression(v)))

  /** SQL registration: `SELECT ip_in_cidr(src_addr, '10.0.0.0/8')`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ip_in_cidr", exprs => IpInCidr(exprs.head, exprs(1)), "built-in")
}
