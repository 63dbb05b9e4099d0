package graft.ext

import graft.SparkSpec

/** VERDICT r14 #2's equality pin: incremental pair-count maintenance
  * (the default `bpeTrain` path — candidates read from a maintained
  * count frame, only adjacency-containing words re-counted, the delta
  * folded back) must produce the SAME merge table, merge-for-merge
  * including the recorded counts, as the full per-round recount it
  * replaced (`incremental = false`, kept as the reference path). The
  * disjointness argument says the two are identical by construction;
  * this spec is the executable form of that argument on inputs chosen
  * to stress the delta algebra: pairs whose counts DROP TO ZERO and
  * later re-enter via a created symbol, l == r runs (where one merge
  * destroys overlapping occurrences of itself), multi-pick rounds, and
  * the fixture corpus at the registered round/pick regime.
  */
class BpeDeltaSpec extends SparkSpec {

  private def trainBoth(corpus: Seq[String], rounds: Int, picks: Int) = {
    import spark.implicits._
    val docs = corpus.toDF("text")
    def run(inc: Boolean) =
      TextQueries.bpeTrain(spark, TextQueries.bpeWordFreq(docs), rounds,
          picks, incremental = inc)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    (run(true), run(false))
  }

  test("delta == recount on count-to-zero and re-created pairs") {
    // round 1 merges (a b): pair (b c) count drops (every 'abc' loses
    // its b-c adjacency) and (ab c) is CREATED; later rounds pick from
    // created symbols — the delta frame must track creations, drops to
    // zero, and re-entries exactly
    val (inc, full) = trainBoth(
      Seq("abc abc abc ab ab bc", "abcabc xbc", "cab cab"), 6, 1)
    assert(inc == full)
  }

  test("delta == recount on l == r runs (self-overlapping merges)") {
    val (inc, full) = trainBoth(
      Seq("aaaaa aaa aaaaaa", "baaab aa", "aabaa"), 5, 1)
    assert(inc == full)
  }

  test("delta == recount with batched disjoint picks") {
    val (inc, full) = trainBoth(
      Seq("the quick brown fox jumps over the lazy dog",
        "the the quick quick brown dog dog dog",
        "pack my box with five dozen liquor jugs"), 4, 4)
    assert(inc == full)
  }

  test("delta == recount on the fixture corpus at the registered regime") {
    val words = TextQueries.bpeWordFreq(graft.Tables.documents(spark, sf))
    def run(inc: Boolean) =
      TextQueries.bpeTrain(spark, words, rounds = 8, picksPerRound = 8,
          incremental = inc)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
    assert(run(true) == run(false))
  }

  test("ledger records shrinking affected fractions as the vocab grows") {
    import spark.implicits._
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "the the quick quick brown dog dog dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow").toDF("text")
    val ledger = scala.collection.mutable.Buffer.empty[(Int, Long, Long)]
    TextQueries.bpeTrain(spark, TextQueries.bpeWordFreq(docs), rounds = 4,
      picksPerRound = 4, ledger = Some(ledger))
    assert(ledger.nonEmpty)
    // every recorded round touched a strict subset of the frame — the
    // whole point of the delta path (total includes the affected rows,
    // so affected < total means unaffected words were NOT re-processed)
    assert(ledger.forall { case (_, aff, total) => aff <= total && total > 0 })
    assert(ledger.exists { case (_, aff, total) => aff < total })
  }
}
