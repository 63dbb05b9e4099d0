package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{IpInCidr, IpUtil}

/** Optimizer rule (SURVEY §4.2's single custom-rule candidate): rewrite
  * `ip_in_cidr(addr, <literal cidr>)` into datasource-pushable predicates
  * over the rendered dotted-quad string.
  *
  *   - octet-aligned prefixes (/8 /16 /24) become `StartsWith(addr, "p.")`
  *     and /32 becomes `EqualTo` — both reach parquet as `PushedFilters`
  *     (StringStartsWith / EqualTo), so row groups whose addr-column
  *     min/max excludes the prefix are never read;
  *   - non-aligned prefix lengths become a pushed octet-aligned guard (the
  *     enclosing /8·/16·/24 superset) AND an exact built-in-arithmetic
  *     residual (split → size-guard → TRY-cast → mask-compare) — pure
  *     codegen'd built-ins, ANSI-safe on any string (IPv6 / malformed
  *     inputs fall to false, never throw), and structurally incapable of
  *     re-matching this rule (the optimizer batch runs to fixpoint);
  *   - /0 is left unrewritten: `ip_in_cidr` is false for non-IPv4-parseable
  *     addresses even under /0, which no pushable predicate expresses.
  *
  * Domain note: the residual agrees with `ip_in_cidr` on well-formed
  * dotted quads, null, IPv6 colon forms, and wrong-arity strings; the one
  * divergence is a dotted quad with an out-of-range octet ("300.1.2.3" —
  * impossible from the R3 renderer), which the arithmetic may accept where
  * the strict parser rejects. Literal CIDRs that don't parse are left
  * untouched.
  */
object CidrPushdown extends Rule[LogicalPlan] {

  private def octets(base: Long, n: Int): String =
    (0 until n).map(i => (base >> (24 - 8 * i)) & 0xff).mkString(".")

  /** Exact ANSI-safe residual: addr masked to `len` bits equals `masked`.
    * Size guard short-circuits non-quad strings to false before any
    * GetArrayItem runs; TRY-mode casts turn non-numeric octets into null
    * (→ Coalesce false) instead of ANSI runtime errors. Null addr stays
    * null, matching the original expression's null propagation.
    */
  private def maskCompare(addr: Expression, mask: Long, masked: Long): Expression = {
    val parts = StringSplit(addr, Literal(UTF8String.fromString("\\."), StringType),
      Literal(-1))
    def oct(i: Int): Expression =
      Cast(GetArrayItem(parts, Literal(i)), LongType, None, EvalMode.TRY)
    val ipLong = Add(Add(Add(
      Multiply(oct(0), Literal(16777216L)),
      Multiply(oct(1), Literal(65536L))),
      Multiply(oct(2), Literal(256L))),
      oct(3))
    val compare = And(
      EqualTo(Size(parts), Literal(4)),
      EqualTo(BitwiseAnd(ipLong, Literal(mask)), Literal(masked)))
    If(IsNull(addr),
      Literal(null, org.apache.spark.sql.types.BooleanType),
      Coalesce(Seq(compare, Literal(false))))
  }

  /** Pushable (possibly partial) rewrite of addr ∈ cidr; None = leave as-is. */
  private def rewrite(addr: Expression, cidrStr: String): Option[Expression] = {
    val slash = cidrStr.indexOf('/')
    if (slash < 0) return None
    val base = IpUtil.ipv4ToLong(cidrStr.substring(0, slash))
    if (base < 0) return None
    val len =
      try cidrStr.substring(slash + 1).toInt
      catch { case _: NumberFormatException => return None }
    if (len < 0 || len > 32) return None
    val mask = if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL
    val masked = base & mask
    len match {
      case 0 => None // /0 still rejects non-IPv4 strings; nothing pushable
      case 32 => Some(EqualTo(addr, Literal(UTF8String.fromString(octets(masked, 4)),
        StringType)))
      case l if l % 8 == 0 =>
        val p = octets(masked, l / 8) + "."
        Some(StartsWith(addr, Literal(UTF8String.fromString(p), StringType)))
      case l =>
        // pushed guard on the enclosing octet-aligned superset + exact
        // ANSI-safe mask-compare residual
        val residual = maskCompare(addr, mask, masked)
        val alignedOctets = l / 8
        if (alignedOctets == 0) Some(residual)
        else {
          val p = octets(masked, alignedOctets) + "."
          Some(And(StartsWith(addr, Literal(UTF8String.fromString(p),
            StringType)), residual))
        }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ IpInCidr(addr, Literal(c: UTF8String, StringType)) if c != null =>
      rewrite(addr, c.toString).getOrElse(e)
  }
}

/** `SparkSessionExtensions` installer: optimizer rule + SQL function
  * registration. Use with
  * `SparkSession.builder.withExtensions(GraftExtensions.install)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.install(ext)
}

object GraftExtensions {
  val install: SparkSessionExtensions => Unit = { ext =>
    ext.injectOptimizerRule(_ => CidrPushdown)
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("ip_in_cidr"),
        new ExpressionInfo("graft.functions.IpInCidr", "ip_in_cidr"),
        (exprs: Seq[Expression]) => IpInCidr(exprs.head, exprs(1))))
  }
}
