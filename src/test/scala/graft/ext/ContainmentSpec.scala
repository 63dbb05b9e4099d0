package graft.ext

import graft.SparkSpec

/** x2l: containment dedup — positive contract on planted docs (the fixture
  * pairs are accidental): a short doc fully carried inside a longer one is
  * found at containment 1.0, the REVERSE direction is correctly absent
  * (that asymmetry is the operator's reason to exist vs Jaccard), exact
  * duplicates collapse to one representative, and a single-token edit that
  * drops containment below τ emits nothing.
  */
class ContainmentSpec extends SparkSpec {

  private def toks(r: Range, p: String): String = r.map(p + _).mkString(" ")

  test("planted subset found asymmetrically; dups collapse; near-miss dropped") {
    import spark.implicits._
    val a = toks(0 until 20, "w")                 // 13 windows
    val b = a + " " + toks(0 until 10, "tail")    // contains ALL of A's
    val c = toks(0 until 30, "other")             // unrelated
    val d = (toks(0 until 10, "w") + " XX " +     // one mid-token edit:
      toks(11 until 20, "w"))                     // kills 8 of A's 13 windows
    val docs = Seq(
      1L -> a, 2L -> b, 3L -> c, 4L -> d,
      5L -> a // exact duplicate of 1 — must collapse, not pair
    ).toDF("doc_id", "text")
    val pairs = DedupQueries.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(pairs.toSet == Set((1L, 2L, 1.0)),
      s"expected exactly A-contained-in-B at c=1.0, got ${pairs.toSeq}")
    // the reverse direction (B in A) is structurally below τ: |W(B)|=23+,
    // only 13 shared — its absence above proves the operator is asymmetric
  }

  test("prefix filter is lossless at the τ boundary") {
    import spark.implicits._
    // A has 20 windows; B carries exactly 18 of them (misses 2).
    // c = 18/20 = 0.9 — ON the threshold: the prefix (20 - ceil(18) + 1
    // = 3 smallest digests) must still hit B despite 2 misses.
    val base = (0 until 27).map("t" + _)
    val a = base.mkString(" ")                       // 20 windows
    val b = base.drop(2).mkString(" ") + " " + toks(0 until 8, "z")
    val docs = Seq(10L -> a, 20L -> b).toDF("doc_id", "text")
    val pairs = DedupQueries.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (x, y, cc) => x == 10L && y == 20L && cc >= 0.9 },
      s"boundary containment pair missed: ${pairs.toSeq}")
  }
}
