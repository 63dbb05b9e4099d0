package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x4k's merge semantics in isolation: the kernel rewrite must be GREEDY
  * left-to-right non-overlapping pair merging (the classic BPE rewrite),
  * including the l == r runs ≥ 5 that the previous two-chained-`replace`
  * formulation got WRONG (ADVICE r13: the consumed delimiter phase-shifts
  * pass 2 onto the wrong pair — ' a a a a a ' two-pass gives
  * ' aa a aa ', greedy gives ' aa aa a ', and a 6-run splits 4 tokens vs
  * greedy's 3), the argmax tie-break must be lexicographic, and the
  * batched disjoint selection must degrade to exact sequential BPE at
  * picksPerRound = 1. The registered query's oracle proves
  * selection-for-selection equality against DuckDB on the fixture corpus;
  * this pins the algebra on adversarial inputs the fixture never
  * produces.
  */
class BpeSpec extends SparkSpec {

  private def train(corpus: Seq[String], rounds: Int, picks: Int = 1) = {
    import spark.implicits._
    val docs = corpus.toDF("text")
    TextQueries.bpeTrain(spark, TextQueries.bpeWordFreq(docs), rounds, picks)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
  }

  private def applyKernel(word: String, merges: Seq[(String, String)],
      fromChars: Boolean = true): String = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(graft.functions.Kernels.bpe_apply(col("w"), merges, fromChars))
      .as[String].head()
  }

  test("a 512-entry merge table rides codegen as one plan object (r16)") {
    import spark.implicits._
    // the plan-literal String[] claim at production depth (VERDICT r15
    // #5): 512 merges — 8× the trained x4k artifact — must still travel
    // as ONE ctx.addReferenceObj and keep the expression inside
    // whole-stage codegen (the retired nested-replace formulation died
    // at a few dozen)
    val merges = (0 until 512).map(i => (s"a$i", s"b$i"))
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // projection eagerly and leave no codegen stage to assert on
    val df = spark.range(2).select(
        when(col("id") === 0, " a7 b7 a100 b100 a511 b511 x ")
          .otherwise(" b7 a7 x ").as("w"))
      .select(graft.functions.Kernels
        .bpe_apply(col("w"), merges, fromChars = false).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("bpe_apply")).getOrElse("")
    assert(line.trim.startsWith("*("),
      s"bpe_apply at 512 merges fell out of codegen:\n$plan")
    assert(df.as[String].collect().sorted.toSeq ==
      Seq(" a7b7 a100b100 a511b511 x ", " b7 a7 x ").sorted)
  }

  test("merge frequency order and lexicographic tie-break") {
    // 'ab' appears twice, 'cd' once -> (a b) first; then within the
    // rewritten vocab 'cd' is the only remaining pair
    val m = train(Seq("ab ab cd"), 2)
    assert(m == Seq((1, "a b", "ab", 2L), (2, "c d", "cd", 1L)))
    // exact tie on count: 'xy' and 'ab' both once -> 'a b' < 'x y' wins
    val t = train(Seq("xy ab"), 1)
    assert(t == Seq((1, "a b", "ab", 1L)))
  }

  test("l == r runs merge greedily: the ADVICE r13 counterexamples") {
    // 5-run: greedy pairs left to right -> [aa aa a]; the retired
    // two-pass replace produced [aa a aa] (wrong order), and on the
    // 6-run FOUR tokens [aa a aa a] where greedy has THREE [aa aa aa]
    assert(applyKernel("aaaaa", Seq(("a", "a"))) == " aa aa a ")
    assert(applyKernel("aaaaaa", Seq(("a", "a"))) == " aa aa aa ")
    assert(applyKernel("aaaa", Seq(("a", "a"))) == " aa aa ")
    assert(applyKernel("aaa", Seq(("a", "a"))) == " aa a ")
    // and the trainer counts the pre-merge pairs: 4 + 2 within one word
    val m = train(Seq("aaaaa aaa"), 1)
    assert(m.map(r => (r._2, r._4)) == Seq(("a a", 6L)))
  }

  test("a just-merged token never chains within a round") {
    // ' a b b ' with merge (a, b): greedy takes (a b) -> 'ab', and the
    // new 'ab' must NOT merge with the following 'b' (the pair is (a, b),
    // not (ab, b)) — the fold's out.last == 'ab' != 'a' guarantees it
    assert(applyKernel("abb", Seq(("a", "b"))) == " ab b ")
    // alternating run: all non-overlapping pairs merge in one pass
    assert(applyKernel("ababab", Seq(("a", "b"))) == " ab ab ab ")
  }

  test("supplementary-plane characters are ONE symbol end to end") {
    // r14 review finding: charAt-based splitting emitted two lone
    // surrogates per astral char, diverging from training (Spark
    // substring = code points), the vocab, and the DuckDB oracles —
    // tokens silently dropped at x4m's vocab join. Code-point split:
    val emoji = new String(Character.toChars(0x1F600)) // 😀, 2 UTF-16 units
    val math = new String(Character.toChars(0x1D54F)) // 𝕏
    assert(applyKernel(s"a${emoji}b", Nil) == s" a $emoji b ")
    // an astral char merges like any other symbol
    assert(applyKernel(s"a$emoji", Seq(("a", emoji))) == s" a$emoji ")
    assert(applyKernel(s"$emoji$emoji$emoji", Seq((emoji, emoji)))
      == s" $emoji$emoji $emoji ")
    // and the trainer sees the same symbol stream: the (a, 😀) pair counts
    val m = train(Seq(s"a$emoji a$emoji"), 1)
    assert(m.map(r => (r._2, r._3, r._4)) == Seq((s"a $emoji", s"a$emoji", 2L)))
    // alphabet id order is CODE-POINT order (the oracle's UTF-8 binary
    // ORDER BY), not UTF-16-unit order: U+E000 (private use, 1 unit)
    // sorts BELOW U+1D54F even though its lead unit 0xE000 is larger
    // than the surrogate 0xD835
    val priv = ""
    assert(Seq(math, priv).sortBy(_.codePointAt(0)) == Seq(priv, math))
    assert(Seq(math, priv).sorted == Seq(math, priv),
      "UTF-16 ordering would have inverted the ids — the bug this pins")
  }

  test("multi-char symbols never match across symbol boundaries") {
    // after merging (a b) the word 'ab c' must NOT let a later pair
    // (b c) match inside it — token-exact comparison guarantees it
    val m = train(Seq("abc abc bc"), 2)
    // counts: (a b)=2, (b c)=3 -> merge1 = (b c) cnt 3; then (a bc)=2
    assert(m == Seq((1, "b c", "bc", 3L), (2, "a bc", "abc", 2L)))
    // and applying in rank order reproduces the training tokenization
    assert(applyKernel("abc", Seq(("b", "c"), ("a", "bc"))) == " abc ")
  }

  test("sym-input mode applies merges to an existing tokenization") {
    assert(applyKernel(" ab c ab ", Seq(("ab", "c")), fromChars = false)
      == " abc ab ")
  }

  test("batched disjoint picks keep certificates exact vs sequential BPE") {
    // corpus where the top pairs are symbol-disjoint: one 2-pick round
    // must select and count exactly what two 1-pick rounds would
    val corpus = Seq("ab ab ab cd cd")
    val batched = train(corpus, 1, picks = 2)
    val sequential = train(corpus, 2, picks = 1)
    assert(batched == Seq((1, "a b", "ab", 3L), (2, "c d", "cd", 2L)))
    assert(batched == sequential)
    // conflicting runner-up is deferred, not miscounted: with (a b) = 3
    // and (b c) = 2, (a b) wins round 1 and (b c) must NOT be batched
    // with it (shared 'b' — its count would go stale mid-round), so the
    // round yields ONE pick even though picksPerRound = 2
    val conflict = train(Seq("abc abc ab"), 1, picks = 2)
    assert(conflict == Seq((1, "a b", "ab", 3L)),
      s"conflicting pair batched: $conflict")
  }

  test("the training loop scales in rounds: 32 rounds / 256-merge budget stays sound") {
    // the registered query trains 8×8; the 32k-vocab claim rests on the
    // loop shape (one vocab-frame job + one ≤64-row collect per round).
    // Drive 32 rounds on the fixture corpus and check the invariants a
    // deep vocab must keep: steps strictly increasing, counts
    // non-increasing WITHIN a round's disjoint picks (the ordered-scan
    // certificate), every merged symbol the concatenation of its pair,
    // and apply-with-all-merges consistent with the trained vocab (every
    // token of the final tokenization is a char or a learned symbol).
    val d = sf
    val words = TextQueries.bpeWordFreq(graft.Tables.documents(spark, d))
    val m = TextQueries.bpeTrain(spark, words, rounds = 32, picksPerRound = 8)
      .collect().sortBy(_.getInt(0))
    assert(m.length > 64, s"expected a deep vocab, got ${m.length} merges")
    m.foreach { r =>
      val Array(l, rr) = r.getString(1).split(" ", 2)
      assert(l + rr == r.getString(2))
    }
    m.groupBy(r => (r.getInt(0) - 1) / 8).values.foreach { round =>
      round.sortBy(_.getInt(0)).sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) >= b.getLong(3),
            s"round picks out of count order: $a then $b")
        case _ =>
      }
    }
    val merges = m.map { r =>
      val Array(l, rr) = r.getString(1).split(" ", 2); (l, rr)
    }.toSeq
    val learned = merges.map { case (l, r) => l + r }.toSet
    import spark.implicits._
    val toks = graft.Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(graft.functions.Kernels.bpe_apply(col("w"), merges,
        fromChars = true).as("sym"))
      .as[String].collect()
      .flatMap(_.trim.split(" "))
    assert(toks.forall(t => t.length == 1 || learned(t)),
      s"tokenization emitted a symbol the vocab never learned: " +
        toks.filterNot(t => t.length == 1 || learned(t)).take(3).toSeq)
  }

  test("x4l serves from the persisted artifact: load equals retrain") {
    val d = sf
    val loaded = TextQueries.loadOrTrainMerges(spark, d)
    val retrained = TextQueries.trainAndPersistMerges(spark, d)
      .collect().sortBy(_.getInt(0))
      .map { r => val Array(l, rr) = r.getString(1).split(" ", 2); (l, rr) }
      .toSeq
    assert(loaded == retrained)
    assert(loaded.size == 64)
    // second load hits the parquet artifact (no retrain) and agrees
    assert(TextQueries.loadOrTrainMerges(spark, d) == loaded)
  }
}
