package graft.ext

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** x3q's ranker-swap audit, moved OUT of the registered plan (r14 review
  * finding): annotating every fused row against the brute vector arm made
  * the registered query execute the O(corpus × queries) cross-join it
  * exists to replace, so the 30× tier gated brute + index instead of the
  * serving path. The audit is quadratic by definition (the baseline IS the
  * full scan) — it belongs here at fixture scale, like x2e's
  * recall-vs-brute audit in LshAuditSpec.
  */
class HybridOverlapSpec extends SparkSpec {

  private def topDocs(df: org.apache.spark.sql.DataFrame): Map[Int, Set[Long]] =
    df.select(col("qid"), col("doc_id")).collect()
      .groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  test("index-served fusion overlaps the brute-armed fusion per query") {
    val brute = topDocs(Registry.queries("x3p_hybrid_rrf")(spark, sf))
    val served = topDocs(Registry.queries("x3q_hybrid_ivfpq")(spark, sf))
    assert(brute.keySet == served.keySet && brute.keySet == Set(0, 1, 2, 3))
    val overlaps = brute.keySet.toSeq.sorted.map { q =>
      val o = (brute(q) & served(q)).size.toDouble / brute(q).size
      info(f"qid $q fused top-10 overlap: $o%.2f")
      o
    }
    // the lexical arm is IDENTICAL in both, so fusion overlap is floored
    // by lexical survivors even where the vector arms disagree
    assert(overlaps.forall(_ >= 0.5), s"fusion overlap collapsed: $overlaps")
  }

  test("vector arms: IVF-PQ top-20 retains brute top-20 members") {
    val brute = TextQueries.bruteVecTop20(spark, sf)
      .select(col("qid").cast("int").as("qid"), col("doc_id")).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = SimilarityQueries.ivfPqTopK(spark, sf, nQueries = 4)
      .select(col("q_id").cast("int").as("qid"), col("c_id").as("doc_id"))
      .collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = (0 to 3).map { q =>
      val r = (brute(q) & ivf(q)).size.toDouble / brute(q).size
      info(f"qid $q vector-arm top-20 recall vs brute: $r%.2f")
      r
    }
    // probe-8-of-10 + PQ at 50 random vectors is the harshest possible
    // regime (top-20 of 49 candidates ≈ background); measured 0.25–0.40
    // here. This floor only guards collapse — the BINDING recall gate is
    // ScaleBench's x3i floor 0.7 at 30×, where the corpus has structure;
    // the dial is nprobe/shortlist (the x3i story).
    assert(recalls.forall(_ >= 0.2), s"vector-arm recall collapsed: $recalls")
  }
}
