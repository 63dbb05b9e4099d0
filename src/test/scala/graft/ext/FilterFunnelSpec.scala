package graft.ext

import java.nio.file.Paths

import org.apache.commons.io.FileUtils

import graft.{Registry, SparkSpec}

/** x4j positive contract on a controlled corpus: the driver fixture never
  * reaches the 'repetitive' branch (first-fail ordering lets too_short
  * claim the repetitive docs), so each of the five outcomes is pinned
  * here with one doc constructed to fail EXACTLY its rule:
  *   - too_short: 5 tokens;
  *   - long_words: 25 ten-char tokens (chars/token ≈ 11 ≥ 6);
  *   - repetitive: "a b a b …" ×30 — 29 bigrams, 2 distinct, ppm ≈ 931k
  *     (order matters: its TTR is also low, but repetitive fires first);
  *   - low_diversity: 29 tokens over a 7-word vocab walked in delta-1..4
  *     cycles — 27 of 28 bigrams distinct (dup ppm ≈ 36k, far below the
  *     200k repetitive threshold) while TTR = 7/29 ≈ 0.24 < 0.30 — low
  *     diversity WITHOUT repetition;
  *   - kept: 25 distinct 3-char tokens.
  * The bigram-distinctness of the low_diversity doc is asserted in the
  * spec itself so the fixture is self-checking.
  */
class FilterFunnelSpec extends SparkSpec {

  private val dir = s"${graft.Tmp.root}/funnel-corpus"

  private lazy val corpus: String = {
    FileUtils.deleteQuietly(Paths.get(dir).toFile)
    import spark.implicits._
    val vocab = (0 until 7).map(i => s"x$i")
    val lowDiv = vocab ++ (2 to 4).flatMap { d =>
      (1 to 7).map(j => vocab(j * d % 7))
    }
    assert(lowDiv.length == 28, lowDiv.length)
    val lowDivDoc = (lowDiv :+ "x0").mkString(" ") // 29 tokens, close the walk
    val toks = lowDivDoc.split(" ")
    val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
    // the walk has one colliding bigram (the d=2 junction reappears in the
    // d=3 cycle) — what the rule needs is dup-bigram ppm far BELOW the
    // 200k repetitive threshold, asserted exactly as the query computes it
    val dupPpm = (bgs.length - bgs.distinct.length).toLong * 1000000L / bgs.length
    assert(dupPpm < 200000L, s"low_diversity doc is repetitive: $dupPpm ppm")
    assert(toks.distinct.length * 1000000L / toks.length < 300000L, "TTR must be < 0.30")
    val docs = Seq(
      (1L, "just five tokens right here"),
      (2L, (1 to 25).map(i => f"longwordnum$i%03d").mkString(" ")),
      (3L, Seq.fill(15)("a b").mkString(" ")),
      (4L, lowDivDoc),
      (5L, (1 to 25).map(i => f"w$i%02d").mkString(" ")))
    docs.map { case (id, text) => (id, text, "en", "test", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x4j: every funnel outcome fires on its constructed doc, once") {
    val got = Registry.queries("x4j_filter_funnel")(spark, corpus)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("too_short" -> 1L, "long_words" -> 1L,
      "repetitive" -> 1L, "low_diversity" -> 1L, "kept" -> 1L), got)
  }
}
