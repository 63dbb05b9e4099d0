package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The algebra x4k/x4l rest on, over random inputs: the kernel's
  * write-pointer fold ([[graft.functions.VecKernel.bpeApply]]) must equal
  * GREEDY left-to-right non-overlapping pair merging on the token list —
  * including l == r runs (the case where the retired two-chained-replace
  * formulation diverged, ADVICE r13: ~7e-5 of random trials, pinned here
  * as named counterexamples so the failure is deterministic, not
  * flaky-looking), symbols that are prefixes/suffixes of each other, and
  * merge results that collide with existing symbols. Pure JVM, no Spark —
  * the kernel body is a static function. Also pins the batched-selection
  * algebra: the ordered disjoint scan equals repeated
  * argmax-with-exclusions (what the DuckDB oracle runs).
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

  /** The engine form: one kernel call applying the merges in order. */
  private def kernel(toks: List[String], merges: (String, String)*): List[String] = {
    val sym = org.apache.spark.unsafe.types.UTF8String
      .fromString(" " + toks.mkString(" ") + " ")
    val flat = merges.flatMap { case (l, r) => Seq(l, r, l + r) }.toArray
    val out = graft.functions.VecKernel.bpeApply(sym, flat, false).toString.trim
    if (out.isEmpty) Nil else out.split(" ").toList
  }

  private val symGen = Gen.oneOf("a", "b", "ab", "ba", "aa", "c")
  private val toksGen = Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, symGen))

  test("property: kernel fold equals greedy non-overlapping merge") {
    check(Prop.forAll(toksGen, symGen, symGen) {
      (toks: List[String], l: String, r: String) =>
        kernel(toks, (l, r)) == greedy(toks, l, r)
    })
  }

  test("property: two sequential merges compose through one kernel call") {
    check(Prop.forAll(toksGen, symGen, symGen, symGen, symGen) {
      (toks: List[String], l1: String, r1: String, l2: String, r2: String) =>
        kernel(toks, (l1, r1), (l2, r2)) ==
          greedy(greedy(toks, l1, r1), l2, r2)
    })
  }

  test("named counterexamples: l == r runs where two-pass replace diverged") {
    // ADVICE r13: the consumed-delimiter miss phase-shifts pass 2 onto
    // the WRONG pair. 5-run: two-pass gave [aa, a, aa]; 6-run: FOUR
    // tokens [aa, a, aa, a]. Greedy (and the kernel) pair left to right.
    def twoPass(toks: List[String], l: String, r: String): List[String] = {
      val s0 = " " + toks.mkString(" ") + " "
      val s1 = s0.replace(s" $l $r ", s" ${l + r} ")
      s1.replace(s" $l $r ", s" ${l + r} ").trim.split(" ").toList
    }
    val five = List.fill(5)("a")
    val six = List.fill(6)("a")
    assert(greedy(five, "a", "a") == List("aa", "aa", "a"))
    assert(greedy(six, "a", "a") == List("aa", "aa", "aa"))
    assert(kernel(five, ("a", "a")) == greedy(five, "a", "a"))
    assert(kernel(six, ("a", "a")) == greedy(six, "a", "a"))
    // the retired formulation really was wrong (kept as documentation)
    assert(twoPass(five, "a", "a") == List("aa", "a", "aa"))
    assert(twoPass(six, "a", "a") == List("aa", "a", "aa", "a"))
  }

  test("property: ordered disjoint scan equals repeated argmax-with-exclusions") {
    // candidates arrive sorted (count DESC, pair ASC); the oracle picks
    // by repeatedly taking the head of the list filtered on symbol
    // disjointness from prior picks — the engine scans once. Same picks.
    val candGen = for {
      n <- Gen.chooseNum(0, 12)
      pairs <- Gen.listOfN(n, Gen.zip(symGen, symGen))
      counts <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    } yield pairs.zip(counts).map { case ((l, r), c) => (s"$l $r", c) }
      .distinctBy(_._1)
      .sortBy { case (p, c) => (-c, p) }
    check(Prop.forAll(candGen, Gen.chooseNum(1, 4)) {
      (cand: List[(String, Long)], maxPicks: Int) =>
        val scan = TextQueries.disjointPicks(cand, maxPicks)
        // reference: repeated argmax over the filtered remainder
        val ref = scala.collection.mutable.Buffer.empty[(String, String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var continue = true
        while (continue && ref.size < maxPicks) {
          cand.find { case (p, _) =>
            val Array(l, r) = p.split(" ", 2)
            !used(l) && !used(r) && !used(l + r)
          } match {
            case Some((p, c)) =>
              val Array(l, r) = p.split(" ", 2)
              ref += ((l, r, l + r, c)); used ++= Seq(l, r, l + r)
            case None => continue = false
          }
        }
        scan == ref.toSeq
    })
  }
}
