package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecKernel

/** Whole-value-space properties for the kernel functions (pure JVM — no
  * Spark session): KernelSpec pins parity with the DataFrame formulations
  * on fixture + hand-picked edge data; these pin the arithmetic itself
  * against independent reference implementations over random inputs.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // magnitudes past the 2^20 quantization domain but safely pre-overflow:
  // 64 elements × (2^27)² = 2^60 < 2^63 for both Σxy and Σ(x−y)²
  private val elemGen = Gen.chooseNum(-(1L << 27), 1L << 27)
  private val vecGen: Gen[List[Long]] = Gen.chooseNum(0, 64).flatMap(n =>
    Gen.listOfN(n, elemGen))

  private def ad(xs: List[Long]) = new GenericArrayData(xs.toArray)

  test("property: dotInto/dist2Into equal BigInt reference sums") {
    check(Prop.forAll(vecGen, vecGen) { (a: List[Long], b: List[Long]) =>
      val out = new Array[Long](1)
      val okDot = VecKernel.dotInto(ad(a), ad(b), out)
      val dotRef =
        if (a.length != b.length) None
        else Some(a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum)
      val dotOk = (okDot, dotRef) match {
        case (false, None) => true
        case (true, Some(r)) => BigInt(out(0)) == r
        case _ => false
      }
      val okD2 = VecKernel.dist2Into(ad(a), ad(b), out)
      val d2Ref =
        if (a.length != b.length) None
        else Some(a.zip(b).map { case (x, y) => val d = BigInt(x) - BigInt(y); d * d }.sum)
      val d2Ok = (okD2, d2Ref) match {
        case (false, None) => true
        case (true, Some(r)) => BigInt(out(0)) == r
        case _ => false
      }
      dotOk && d2Ok
    })
  }

  test("property: dotInto throws on overflow instead of wrapping") {
    val out = new Array[Long](1)
    intercept[ArithmeticException] {
      VecKernel.dotInto(ad(List(Long.MaxValue)), ad(List(2L)), out)
    }
    intercept[ArithmeticException] {
      VecKernel.dist2Into(ad(List(Long.MaxValue)), ad(List(Long.MinValue)), out)
    }
  }

  private val shingleGen: Gen[List[String]] = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.asciiPrintableStr.map(_.take(24))))

  test("property: minhashSig equals the naive per-shingle-min reference") {
    check(Prop.forAll(shingleGen) { (sh: List[String]) =>
      val k = 16
      val got = VecKernel.minhashSig(
        new GenericArrayData(sh.map(UTF8String.fromString).toArray), k)
      val ref = Array.fill(k)(Long.MaxValue)
      sh.foreach { s =>
        val base = XXH64.hashLong(XXH64.hashUTF8String(UTF8String.fromString(s), 42L), 42L)
        (0 until k).foreach { i =>
          val p = XXH64.hashInt(i, base)
          if (p < ref(i)) ref(i) = p
        }
      }
      got.toLongArray().sameElements(ref)
    })
  }

  test("property: simhash64 bit i reflects the sign of the vote sum") {
    check(Prop.forAll(shingleGen) { (sh: List[String]) =>
      val got = VecKernel.simhash64(
        new GenericArrayData(sh.map(UTF8String.fromString).toArray))
      val hs = sh.map(s => XXH64.hashUTF8String(UTF8String.fromString(s), 42L))
      (0 until 64).forall { i =>
        val vote = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        (((got >>> i) & 1L) == 1L) == (vote > 0)
      }
    })
  }

  test("property: quantize matches BigDecimal HALF_UP per element") {
    val floatGen = Gen.chooseNum(-64f, 64f)
    check(Prop.forAll(Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, floatGen))) {
      (xs: List[Float]) =>
        val got = VecKernel.quantize(
          new GenericArrayData(xs.toArray)).toLongArray()
        val ref = xs.map { f =>
          java.math.BigDecimal.valueOf(f.toDouble * 1048576d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
        }
        got.sameElements(ref)
    })
  }

  // tiny-alphabet tokens so windows collide often (dedup paths exercised)
  private val tokGen = Gen.oneOf("a", "b", "ab", "", "x y")
  private val toksGen: Gen[List[String]] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, tokGen))

  private def utf8(xs: List[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  test("property: windowMd5 equals the join+md5 reference, both modes") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    check(Prop.forAll(toksGen, Gen.chooseNum(1, 9)) { (toks: List[String], n: Int) =>
      val refAll =
        if (toks.length < n) Nil
        else (0 to toks.length - n).map(i => md5hex(toks.slice(i, i + n).mkString(" ")))
      val all = VecKernel.windowMd5(utf8(toks), n, dedup = false)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      val ded = VecKernel.windowMd5(utf8(toks), n, dedup = true)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      all.sameElements(refAll) && ded.sameElements(refAll.distinct)
    })
  }

  test("property: funnelStats equals the expression-formulation reference") {
    // the r13 kernel replaced split/transform/array_distinct/CASE columns
    // (TextQueries.withFunnelVerdict) — this is that retired formulation
    // as a direct reference, over texts with consecutive/leading/trailing
    // spaces (split keeps the empty tokens; so must the kernel)
    def ref(text: String, nChars: Long): (Long, Long, Long, String) = {
      val w = text.split(" ", -1) // limit -1 = Spark split semantics
      val n = w.length.toLong
      val bg = if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Nil
      val dbPpm =
        if (bg.nonEmpty) (bg.length - bg.distinct.length).toLong * 1000000L / bg.length
        else 0L
      val ttrPpm = w.distinct.length.toLong * 1000000L / n
      val rule =
        if (n < 20L) "too_short"
        else if (nChars * 100L / n >= 600L) "long_words"
        else if (dbPpm >= 200000L) "repetitive"
        else if (ttrPpm < 300000L) "low_diversity"
        else "kept"
      (n, dbPpm, ttrPpm, rule)
    }
    val textGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ', ' ')).map(_.mkString))
    check(Prop.forAll(textGen, Gen.chooseNum(0L, 5000L)) {
      (text: String, nChars: Long) =>
        val row = VecKernel.funnelStats(UTF8String.fromString(text), nChars)
        val got = (row.getLong(0), row.getLong(1), row.getLong(2),
          row.getUTF8String(3).toString)
        got == ref(text, nChars)
    })
  }

  test("property: sortedIntersectSize equals the set-intersection size") {
    val setGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.map(_.take(4))))
    check(Prop.forAll(setGen, setGen) { (a: List[String], b: List[String]) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = VecKernel.sortedIntersectSize(utf8(sa), utf8(sb))
      got == sa.toSet.intersect(sb.toSet).size
    })
  }
}
