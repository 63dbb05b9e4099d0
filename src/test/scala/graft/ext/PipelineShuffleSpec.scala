package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x6k deterministic corpus shuffle + x3i IVF-PQ composition properties
  * that the DuckDB oracle cannot express directly: partition-count
  * invariance of the distributed rank, and the IVF pruning contract.
  */
class PipelineShuffleSpec extends SparkSpec {

  test("x6k ranks are partition-count-invariant (3 vs 8 range partitions)") {
    // the rank VALUE must not depend on where range boundaries land —
    // x6g's argument applied to ordering: offsets correct for boundaries,
    // and unique keys mean no tie can straddle a boundary
    val r3 = PipelineQueries.corpusShufflePlan(spark, sf, nPart = 3)
      .select("doc_id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r8 = PipelineQueries.corpusShufflePlan(spark, sf, nPart = 8)
      .select("doc_id", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r3 == r8)
    assert(r3.nonEmpty)
  }

  test("x6m split manifest is shuffle-width-invariant and quota-exact") {
    // the stratified split's two-phase rank must produce the SAME
    // manifest under different shuffle widths (the x6k argument per
    // stratum), and every stratum's val/test cells hold exactly
    // ceil(n/10) docs
    def rows(parts: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.Registry.queries("x6m_stratified_split")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = rows("8"); val b = rows("64")
    assert(a == b && a.nonEmpty)
    val out = graft.Registry.queries("x6m_stratified_split")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getString(2), r.getLong(3)))
    val byStratum = out.groupBy(_._1)
    byStratum.foreach { case (st, cells) =>
      val n = cells.map(_._3).sum
      val vq = (n + 9) / 10
      // tiny strata: quotas clamp to what exists (n=1 -> all val)
      val valExp = math.min(vq, n)
      val testExp = math.min(vq, math.max(0L, n - vq))
      val m = cells.map(c => c._2 -> c._3).toMap
      assert(m.getOrElse("val", 0L) == valExp, s"$st val ${m.get("val")} != $valExp")
      assert(m.getOrElse("test", 0L) == testExp, s"$st test ${m.get("test")} != $testExp")
      assert(m.getOrElse("train", 0L) == math.max(0L, n - 2 * vq), st.toString)
    }
  }

  test("x6n mixture manifest is shuffle-width-invariant and budget-exact") {
    // same two-phase-rank argument as x6m: the sampled SET (witnessed by
    // sum_doc_id) must not move under a different shuffle width, every
    // source must fill its quota exactly, and the quotas must sum to the
    // 20% budget EXACTLY (the largest-remainder contract a Bernoulli
    // sampler cannot meet)
    def rows(parts: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.Registry.queries("x6n_temperature_mix")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = rows("8"); val b = rows("64")
    assert(a == b && a.nonEmpty)
    val out = graft.Registry.queries("x6n_temperature_mix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = out.map(_._2).sum
    assert(out.map(_._4).sum == total / 5,
      s"quotas ${out.map(_._4).sum} != budget ${total / 5}")
    out.foreach { case (src, n, _, quota, sampled) =>
      assert(sampled == quota, s"$src sampled $sampled != quota $quota (n=$n)")
    }
    // temperature direction: sampling fraction of the smallest source is
    // at least that of the largest (n^0.5 up-weights the tail)
    val biggest = out.maxBy(_._2); val smallest = out.minBy(_._2)
    if (biggest._2 > smallest._2)
      assert(smallest._4.toDouble / smallest._2 >= biggest._4.toDouble / biggest._2,
        s"tail not up-weighted: $smallest vs $biggest")
  }

  test("x6k is a permutation consistent with the seeded key order") {
    val rows = PipelineQueries.corpusShufflePlan(spark, sf, nPart = 5)
      .select("shuffle_key", "shuffle_rank").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // ranks are exactly 1..n, each once
    assert(rows.map(_._2).sorted.toSeq == (1L to rows.length.toLong))
    // and ordering by rank IS ordering by key (monotone bijection)
    assert(rows.sortBy(_._2).map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("x3j returns only candidates matching the metadata predicate, 5 per query") {
    // the filtered-search contract: no post-filter leak — every returned
    // candidate satisfies the predicate that was applied to the code rows
    val out = graft.Registry.queries("x3j_filtered_knn")(spark, sf)
      .select("q_id", "c_id", "rank", "adc_rank").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[Number](1).longValue
      assert(c % 7 < 3, s"candidate $c fails the vec_id % 7 < 3 predicate")
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 20) // from the 20-deep shortlist
    }
    val byQ = out.groupBy(_.getAs[Number](0).longValue)
    assert(byQ.size == 8 && byQ.values.forall(_.map(_.getInt(2)).sorted.toSeq == (1 to 5)))
  }

  test("x3i returns 5 reranked rows per query with cos descending") {
    val out = graft.Registry.queries("x3i_ivf_pq")(spark, sf)
      .select("q_id", "rank", "c_id", "cos", "adc_rank").collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      // exact-rerank ordering: cos non-increasing in rank, ties impossible
      // to order wrongly because c_id breaks them in the window
      assert(sorted.map(_.getDouble(3)).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      })
      // shortlist bound: every reranked row came from the 20-deep ADC list
      assert(rs.forall(r => r.getInt(4) >= 1 && r.getInt(4) <= 20))
    }
  }

  test("x3i only returns candidates whose partition the query probed") {
    import graft.functions.Kernels
    val e = graft.Tables.embeddings(spark, sf).select(col("vec_id"),
      Kernels.float_vec_quant(col("embedding")).as("qe"), col("label"))
    // recompute the coarse probes with the same integer-exact arithmetic
    val sc = graft.functions.Aggregators.elementwise_sum_count(64)
    val cent = e.groupBy(col("label")).agg(sc(col("qe")).as("sc"))
      .select(col("label").as("cl"),
        transform(slice(col("sc"), 1, 64),
          x => round(x.cast("double") /
            element_at(col("sc"), 65).cast("double")).cast("long")).as("c_emb"))
    def qdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Kernels.long_vec_dot(a, b)
    val probed = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qe").as("q_emb"))
      .crossJoin(broadcast(cent))
      .select(col("q_id"), col("cl"),
        (qdot(col("q_emb"), col("c_emb")).cast("double") /
          (sqrt(qdot(col("q_emb"), col("q_emb")).cast("double")) *
            sqrt(qdot(col("c_emb"), col("c_emb")).cast("double")))).as("ccos"))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("ccos").desc, col("cl"))))
      .filter(col("pr") <= 8) // x3i's nprobe (r11: retuned 3->8, see its scaladoc)
      .select("q_id", "cl").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
    val labels = e.select("vec_id", "label").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toMap
    val out = graft.Registry.queries("x3i_ivf_pq")(spark, sf)
      .select("q_id", "c_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, c) = (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
      assert(probed.contains((q, labels(c))),
        s"candidate $c (label ${labels(c)}) not in query $q's probed partitions")
    }
  }
}
