package graft.ext

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec, Tables}

/** x4t: reference-LM quality filter (CCNet shape) — scoring totality under
  * stupid backoff: EVERY document with at least one bigram gets a finite
  * score, including documents from non-reference sources whose bigrams the
  * reference LM never saw (the case the backoff exists for).
  */
class LmFilterSpec extends SparkSpec {

  private lazy val out = Registry.queries("x4t_lm_filter")(spark, sf)

  test("every multi-token document is scored — backoff makes the LM total") {
    val scorable = Tables.documents(spark, sf)
      .where(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() == scorable,
      s"scored ${out.count()} of $scorable multi-token docs")
  }

  test("scores are finite and keep is the declared threshold") {
    val rows = out.collect()
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("bits_e4"))),
      "null score — a bigram fell through both the LM and the backoff")
    rows.foreach { r =>
      val bits = r.getAs[Long]("bits_e4")
      assert(bits > 0 && bits < 1000000L, s"doc ${r.get(0)} bits_e4=$bits")
      assert(r.getAs[Boolean]("keep") == (bits <= 52000L))
    }
  }

  test("the streaming face (q52s) emits exactly the batch verdicts") {
    // independent of the shared oracle text: stream-score over
    // micro-batches must equal batch-score row for row
    val batch = out.collect().map(_.toSeq).toSet
    val stream = Registry.queries("q52s_stream_lm_filter")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"stream/batch diverge: ${(stream diff batch).take(3)} vs ${(batch diff stream).take(3)}")
  }

  test("the filter separates: both verdicts occur on the fixture") {
    val keeps = out.groupBy(col("keep")).count().collect()
      .map(r => r.getAs[Boolean]("keep") -> r.getAs[Long]("count")).toMap
    assert(keeps.getOrElse(true, 0L) > 0, "filter kept nothing")
    assert(keeps.getOrElse(false, 0L) > 0, "filter dropped nothing")
  }
}
