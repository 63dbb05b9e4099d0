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
  *   - /32 becomes `EqualTo(addr, canonical)` — exact on its own, because
  *     [[IpUtil.ipv4ToLong]] accepts exactly the canonical rendering (no
  *     leading zeros), so membership ⇔ string equality;
  *   - octet-aligned prefixes (/8 /16 /24) become `StartsWith(addr, "p.")`
  *     AND a canonical-quad validity residual — StartsWith reaches parquet
  *     as a `PushedFilters` StringStartsWith (row groups whose addr-column
  *     min/max excludes the prefix are never read); the residual restores
  *     exactness for strings like "10.300.1.2" / "10.1.2.3.4" that share
  *     the prefix but are not valid addresses;
  *   - non-aligned prefix lengths become a pushed octet-aligned guard (the
  *     enclosing /8·/16·/24 superset) AND an exact built-in-arithmetic
  *     residual (canonical-quad RLIKE → TRY-cast → mask-compare) — pure
  *     codegen'd built-ins, ANSI-safe on any string (IPv6 / malformed
  *     inputs fall to false, never throw), and structurally incapable of
  *     re-matching this rule (the optimizer batch runs to fixpoint);
  *   - /0 is left unrewritten: `ip_in_cidr` is false for non-IPv4-parseable
  *     addresses even under /0, which no pushable predicate expresses.
  *
  * Exactness: every rewrite agrees with `ip_in_cidr` on EVERY string —
  * canonical quads, leading-zero quads ("010.1.2.3", rejected by both),
  * out-of-range octets ("10.300.1.2"), wrong arity, IPv6 colon forms,
  * null — asserted rule-on ≡ rule-off in PlanSpec. Both sides share one
  * definition of "valid address": the canonical language emitted by the R3
  * renderer and accepted by the strict parser. Literal CIDRs that don't
  * parse are left untouched.
  */
object CidrPushdown extends Rule[LogicalPlan] {

  private def octets(base: Long, n: Int): String =
    (0 until n).map(i => (base >> (24 - 8 * i)) & 0xff).mkString(".")

  /** Canonical dotted-quad recognizer — the exact output language of the R3
    * renderer and input language of [[IpUtil.ipv4ToLong]]: four 0–255
    * octets, no leading zeros. Codegen'd RLike (the pattern is a literal, so
    * the regex compiles once per task, not per row).
    */
  private def validQuad(addr: Expression): Expression = {
    val oct = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    RLike(addr, Literal(UTF8String.fromString(s"^($oct\\.){3}$oct$$"), StringType))
  }

  /** Exact ANSI-safe residual: addr is a canonical quad AND masked to `len`
    * bits equals `masked`. The validity conjunct guards the arithmetic
    * (TRY-mode casts additionally turn any non-numeric octet into null →
    * Coalesce false instead of an ANSI runtime error). Null addr stays
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
      validQuad(addr),
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
        // StartsWith is the pushed scan guard; the validity residual makes
        // the conjunction exact (prefix-sharing non-addresses like
        // "10.300.1.2" must stay false). Membership ⇔ canonical quad ∧
        // literal "p." prefix, since canonical octets render with no
        // leading zeros.
        val p = octets(masked, l / 8) + "."
        Some(And(StartsWith(addr, Literal(UTF8String.fromString(p), StringType)),
          validQuad(addr)))
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
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectResolutionRule(_ => AsOfDeduplicateRight)
    // infix `ASOF JOIN ... MATCH_CONDITION (...)` SQL syntax, lowered onto
    // the asof_join table function (AsOfInfixParser scaladoc)
    ext.injectParser((_, delegate) => new AsOfInfixParser(delegate))
    // SQL surface for the as-of operator: a table-valued function, so
    // spark.sql users reach AsOfJoinExec without the DataFrame API
    ext.injectTableFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("asof_join"),
        new ExpressionInfo("graft.plans.AsOfJoin", "asof_join"),
        (exprs: Seq[Expression]) => AsOfSql.build(exprs)))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("ip_in_cidr"),
        new ExpressionInfo("graft.functions.IpInCidr", "ip_in_cidr"),
        (exprs: Seq[Expression]) => IpInCidr(exprs.head, exprs(1))))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("ip_render"),
        new ExpressionInfo("graft.functions.IpRender", "ip_render"),
        (exprs: Seq[Expression]) => graft.functions.IpRender(exprs.head)))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("ip_to_bytes"),
        new ExpressionInfo("graft.functions.IpToBytes", "ip_to_bytes"),
        (exprs: Seq[Expression]) => graft.functions.IpToBytes(exprs.head)))
    // vector/MinHash kernels on the SQL surface too (Column API: Kernels._)
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("float_vec_quant"),
        new ExpressionInfo("graft.functions.FloatVecQuant", "float_vec_quant"),
        (exprs: Seq[Expression]) => graft.functions.FloatVecQuant(exprs.head)))
    def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name requires $n arguments, got ${exprs.length}")
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("long_vec_dot"),
        new ExpressionInfo("graft.functions.LongVecDot", "long_vec_dot"),
        (exprs: Seq[Expression]) => {
          arity("long_vec_dot", 2, exprs)
          graft.functions.LongVecDot(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("long_vec_dist2"),
        new ExpressionInfo("graft.functions.LongVecDist2", "long_vec_dist2"),
        (exprs: Seq[Expression]) => {
          arity("long_vec_dist2", 2, exprs)
          graft.functions.LongVecDist2(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_sig"),
        new ExpressionInfo("graft.functions.SimHashSig", "simhash_sig"),
        (exprs: Seq[Expression]) => graft.functions.SimHashSig(exprs.head)))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
        new ExpressionInfo("graft.functions.MinHashSig", "minhash_sig"),
        (exprs: Seq[Expression]) => {
          arity("minhash_sig", 2, exprs)
          graft.functions.MinHashSig(exprs.head,
            intLit("minhash_sig(shingles, k)", "k", exprs(1)))
        }))
    // any integral literal works for a width argument (an explicit
    // BIGINT/SMALLINT literal like 8L used to be rejected confusingly)
    def intLit(name: String, arg: String, e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Short, _) => n.toInt
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Byte, _) => n.toInt
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Long, _)
          if n.isValidInt => n.toInt
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be an integer literal, got $other")
    }
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("window_md5"),
        new ExpressionInfo("graft.functions.WindowMd5", "window_md5"),
        (exprs: Seq[Expression]) => {
          // optional 3rd arg: dedup (default true) — the Scala API's
          // dedup=false mode (x7b's bigram totals) is SQL-reachable too
          if (exprs.length != 2 && exprs.length != 3)
            throw new IllegalArgumentException(
              s"window_md5(tokens, n[, dedup]) takes 2 or 3 arguments, got ${exprs.length}")
          val dedup = exprs.length < 3 || (exprs(2) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(b: Boolean, _) => b
            case other => throw new IllegalArgumentException(
              s"window_md5: dedup must be a BOOLEAN literal, got $other")
          })
          graft.functions.WindowMd5(exprs.head,
            intLit("window_md5(tokens, n[, dedup])", "n", exprs(1)), dedup)
        }))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("token_stats"),
        new ExpressionInfo("graft.functions.TokenStats", "token_stats"),
        (exprs: Seq[Expression]) => {
          arity("token_stats", 1, exprs)
          graft.functions.TokenStats(exprs.head)
        }))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("interleave_bits"),
        new ExpressionInfo("graft.functions.InterleaveBits", "interleave_bits"),
        (exprs: Seq[Expression]) => {
          arity("interleave_bits", 2, exprs)
          graft.functions.InterleaveBits(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_size"),
        new ExpressionInfo("graft.functions.SortedIntersectSize", "sorted_intersect_size"),
        (exprs: Seq[Expression]) => {
          arity("sorted_intersect_size", 2, exprs)
          graft.functions.SortedIntersectSize(exprs.head, exprs(1))
        }))
  }
}
