package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x4k's merge semantics in isolation: the two-pass padded replace must
  * equal GREEDY left-to-right non-overlapping pair merging (the classic
  * BPE rewrite), including the overlapping-run case a single replace pass
  * gets wrong, and the argmax tie-break must be lexicographic. The
  * registered query's oracle proves merge-for-merge equality against
  * DuckDB on the fixture corpus; this pins the algebra on adversarial
  * inputs the fixture never produces.
  */
class BpeSpec extends SparkSpec {

  private def train(corpus: Seq[String], n: Int) = {
    import spark.implicits._
    val docs = corpus.toDF("text")
    TextQueries.bpeTrain(spark, TextQueries.bpeWordFreq(docs), n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
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

  test("overlapping run merges greedily: aaaa -> [aa aa], aaa -> [aa a]") {
    import spark.implicits._
    val docs = Seq("aaaa aaa").toDF("text")
    val words = TextQueries.bpeWordFreq(docs).localCheckpoint()
    try {
      // one merge of (a a): count = 3 (aaaa) + 2 (aaa) = 5
      val m = TextQueries.bpeTrain(spark, words, 1).collect()
      assert(m.map(r => (r.getString(1), r.getLong(3))).toSeq ==
        Seq(("a a", 5L)))
      // replay the rewrite the trainer applied and inspect the vocab:
      // greedy non-overlapping, so ' a a a a ' -> ' aa aa ' and
      // ' a a a ' -> ' aa a ' (NOT ' a aa ' or ' aa aa ')
      def rep(c: org.apache.spark.sql.Column) =
        org.apache.spark.sql.functions.replace(c, lit(" a a "), lit(" aa "))
      val rewritten = words.select(rep(rep(col("sym"))).as("sym"))
        .as[String].collect().toSet
      assert(rewritten == Set(" aa aa ", " aa a "))
    } finally words.unpersist()
  }

  test("multi-char symbols never match across symbol boundaries") {
    // after merging (a b) the word 'ab c' must NOT let a later pair
    // (b c) match inside it — the padding guarantees boundary exactness
    val m = train(Seq("abc abc bc"), 2)
    // counts: (a b)=2, (b c)=3 -> merge1 = (b c) cnt 3; then (a bc)=2
    assert(m == Seq((1, "b c", "bc", 3L), (2, "a bc", "abc", 2L)))
  }
}
