package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The algebra x4k/x4l rest on, over random inputs: TWO chained literal
  * space-padded replaces must equal GREEDY left-to-right non-overlapping
  * pair merging on the token list — including runs ('a a a a'), symbols
  * that are prefixes/suffixes of each other ('a' vs 'ab'), and pairs
  * whose merge result collides with an existing symbol. BpeSpec pins the
  * named cases; this hammers the whole space (pure JVM, no Spark — the
  * string algebra is what Spark's `replace` and DuckDB's `replace` both
  * implement: replace-all, left-to-right, non-overlapping).
  */
class BpePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  /** Greedy single-round BPE merge on the token list — the textbook
    * definition (scan left to right, merge non-overlapping occurrences,
    * a merged token never re-matches within the round).
    */
  private def greedy(toks: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  /** The engine/oracle form: space-padded string, two replace-all passes. */
  private def twoPass(toks: List[String], l: String, r: String): List[String] = {
    val s0 = " " + toks.mkString(" ") + " "
    val s1 = s0.replace(s" $l $r ", s" ${l + r} ")
    val s2 = s1.replace(s" $l $r ", s" ${l + r} ")
    val t = s2.trim
    if (t.isEmpty) Nil else t.split(" ").toList
  }

  private val symGen = Gen.oneOf("a", "b", "ab", "ba", "aa", "c")
  private val toksGen = Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, symGen))

  test("property: two-pass padded replace equals greedy non-overlapping merge") {
    check(Prop.forAll(toksGen, symGen, symGen) {
      (toks: List[String], l: String, r: String) =>
        twoPass(toks, l, r) == greedy(toks, l, r)
    })
  }

  test("property: one pass is NOT enough (the second pass is load-bearing)") {
    // witness that the algebra needs both passes: the alternating run
    // misses its middle pair after one replace
    val toks = List("a", "b", "a", "b", "a", "b")
    val one = (" " + toks.mkString(" ") + " ").replace(" a b ", " ab ").trim
      .split(" ").toList
    assert(one != greedy(toks, "a", "b"), "one pass unexpectedly sufficed")
    assert(twoPass(toks, "a", "b") == greedy(toks, "a", "b"))
  }
}
