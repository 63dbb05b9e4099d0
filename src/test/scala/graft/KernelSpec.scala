package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Kernels

/** Parity + null-semantics obligations for the codegen-native kernels:
  * every kernel must be bit-identical to the higher-order-function
  * formulation it replaced, on real fixture data and on adversarial
  * shapes (nulls, length mismatches, empties).
  */
class KernelSpec extends SparkSpec {

  import org.apache.spark.sql.Column

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def hofDist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  private def quant(c: Column): Column =
    transform(c, x => round(x.cast(DoubleType) * 1048576d).cast(LongType))

  test("long_vec_dot/dist2 equal the aggregate(zip_with(...)) formulation on fixture pairs") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), quant(col("embedding")).as("qe"))
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 40)
    val diff = pairs.select(
      (Kernels.long_vec_dot(col("a.qe"), col("b.qe")) <=>
        hofDot(col("a.qe"), col("b.qe"))).as("dot_eq"),
      (Kernels.long_vec_dist2(col("a.qe"), col("b.qe")) <=>
        hofDist2(col("a.qe"), col("b.qe"))).as("d2_eq"))
      .filter(!col("dot_eq") || !col("d2_eq"))
    assert(diff.count() == 0)
    // non-vacuity: the comparison ran over a real pair set
    assert(pairs.count() > 100)
  }

  test("long_vec_dot/dist2 null semantics match the lambda formulation") {
    import spark.implicits._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),          // plain
      (Seq(-5L, 0L, 7L), Seq(3L, -9L, 2L)),        // negatives
      (Seq.empty[Long], Seq.empty[Long])           // empty → 0
    ).toDF("a", "b")
    val got = rows.select(
      Kernels.long_vec_dot($"a", $"b").as("dot"),
      Kernels.long_vec_dist2($"a", $"b").as("d2"),
      hofDot($"a", $"b").as("hdot"),
      hofDist2($"a", $"b").as("hd2")).collect()
    got.foreach { r =>
      assert(r.get(0) == r.get(2), r.toString)
      assert(r.get(1) == r.get(3), r.toString)
    }
    // null array propagates; length mismatch and null element → null
    // (zip_with pads the shorter side with null; null * x is null; the
    // lambda sum then yields null — the kernel declares the same result)
    val edge = Seq(
      (Some(Seq(Some(1L), Some(2L))), None: Option[Seq[Option[Long]]]),
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L)))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L))))
    ).toDF("a", "b")
    val vals = edge.select(
      Kernels.long_vec_dot($"a", $"b").as("dot"),
      Kernels.long_vec_dist2($"a", $"b").as("d2")).collect()
    vals.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1), r.toString) }
  }

  test("float_vec_quant equals the transform formulation, half-way cases included") {
    import spark.implicits._
    val fixture = Tables.embeddings(spark, sf).select(col("embedding").as("a"))
    // adversarial values: exact halves at the 2^20 grid (x*1048576 = n+0.5),
    // negatives, zero, denormal-ish smalls
    val edge = Seq(
      Seq(0.5f / 1048576f, -0.5f / 1048576f, 1.5f / 1048576f, -1.5f / 1048576f),
      Seq(0f, -0f, 1e-30f, -1e-30f, 0.9999999f, -0.9999999f)).toDF("a")
    for (df <- Seq(fixture, edge)) {
      val bad = df.select(
        Kernels.float_vec_quant(col("a")).as("k"),
        transform(col("a"), x => round(x.cast(DoubleType) * 1048576d).cast(LongType)).as("t"))
        .filter(!(col("k") <=> col("t")))
      assert(bad.count() == 0, bad.collect().mkString(";"))
    }
  }

  test("kernels are callable from SQL via GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("ks_emb")
    val r = spark.sql("""
      SELECT long_vec_dot(q, q) AS n2,
             long_vec_dist2(q, q) AS z,
             minhash_sig(array('a b c', 'd e f'), 4) AS sig
      FROM (SELECT float_vec_quant(embedding) AS q FROM ks_emb LIMIT 3)""").collect()
    assert(r.length == 3)
    r.foreach { row =>
      assert(row.getLong(0) > 0 && row.getLong(1) == 0)
      assert(row.getSeq[Long](2).length == 4)
    }
  }

  test("window_md5 SQL surface takes integral-literal widths and the 3-arg dedup form") {
    // ADVICE r06: 8L used to be rejected; dedup=false was Scala-API-only
    val r = spark.sql("""
      SELECT size(window_md5(array('a','b','a','b','a'), 2L)) AS dedup_n,
             size(window_md5(array('a','b','a','b','a'), 2S, false)) AS raw_n,
             window_md5(array('a','b','a','b','a'), 2) AS dedup_w,
             window_md5(array('a','b','a','b','a'), 2, false) AS raw_w
    """).head()
    assert(r.getInt(0) == 2) // distinct windows: ab, ba
    assert(r.getInt(1) == 4) // all windows: ab, ba, ab, ba
    assert(r.getSeq[String](3).toSet == r.getSeq[String](2).toSet)
    val bad = intercept[Exception](spark.sql(
      "SELECT window_md5(array('a'), 2, 'yes')").collect())
    assert(bad.getMessage.contains("BOOLEAN"), bad.getMessage)
  }

  test("minhash_sig equals the explode + elementwise-min agg formulation on fixture docs") {
    val sh = ext.DedupQueries.shinglesFor(spark, sf)
    val kernel = sh.select(col("doc_id"), Kernels.minhash_sig(col("sh"), 64).as("sig"))
    val agg = ext.DedupQueries.minhashSigsAgg(sh)
    val joined = kernel.as("k").join(agg.as("a"), "doc_id")
      .filter(!(col("k.sig") <=> col("a.sig")))
    assert(joined.count() == 0)
    assert(kernel.count() == agg.count() && kernel.count() > 0)
  }

  test("minhash_sig/simhash_sig match the agg formulations on null shingles too") {
    import spark.implicits._
    // a null element folds as xxhash64(null) = the untouched seed (42) in
    // the agg formulations — the kernels must vote/fold identically
    val sh = Seq(
      (1L, Seq[String]("a b c", null, "d e f")),
      (2L, Seq[String](null, null))).toDF("doc_id", "sh")
    val mh = sh.select(col("doc_id"), Kernels.minhash_sig(col("sh"), 64).as("sig"))
      .as("k").join(ext.DedupQueries.minhashSigsAgg(sh).as("a"), "doc_id")
      .filter(!(col("k.sig") <=> col("a.sig")))
    assert(mh.count() == 0)
    val si = sh.select(col("doc_id"), Kernels.simhash_sig(col("sh")).as("sim"))
      .as("k").join(ext.DedupQueries.simhashAgg(sh).as("a"), "doc_id")
      .filter(!(col("k.sim") <=> col("a.sim")))
    assert(si.count() == 0)
  }

  test("simhash_sig equals the 64-vote-column agg formulation on fixture docs") {
    val sh = ext.DedupQueries.shinglesFor(spark, sf)
    val kernel = sh.select(col("doc_id"), Kernels.simhash_sig(col("sh")).as("sim"))
    val agg = ext.DedupQueries.simhashAgg(sh)
    val joined = kernel.as("k").join(agg.as("a"), "doc_id")
      .filter(!(col("k.sim") <=> col("a.sim")))
    assert(joined.count() == 0)
    assert(kernel.count() == agg.count() && kernel.count() > 0)
  }

  test("kernels stay inside whole-stage codegen") {
    // inputs built from codegen-supported constructors (array/split) — a
    // higher-order `transform` in the same project would itself fall back
    // and mask what this test pins
    val df = Tables.lineitem(spark, sf).select(
        array(col("l_orderkey"), col("l_partkey"), col("l_suppkey")).as("a"),
        array(col("l_partkey"), col("l_suppkey"), col("l_orderkey")).as("b"))
      .select(Kernels.long_vec_dot(col("a"), col("b")).as("dot"),
        Kernels.long_vec_dist2(col("a"), col("b")).as("d2"))
      .filter(col("dot") > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the project/filter evaluating the kernel carries the *(n) codegen
    // marker — the expression did not fall back to interpreted eval
    val line = plan.linesIterator.find(_.contains("long_vec_dot")).getOrElse("")
    assert(line.trim.startsWith("*("), s"kernel outside codegen:\n$plan")

    val sigDf = Tables.documents(spark, sf)
      .select(Kernels.minhash_sig(split(col("text"), " "), 16).as("sig"))
      .filter(size(col("sig")) === 16)
    val sigPlan = sigDf.queryExecution.executedPlan.toString
    val sigLine = sigPlan.linesIterator.find(_.contains("minhash_sig")).getOrElse("")
    assert(sigLine.trim.startsWith("*("), s"minhash_sig outside codegen:\n$sigPlan")
    assert(sigDf.count() > 0)
  }

  test("token_stats equals the explode/groupBy formulation; entropy within float noise") {
    val exploded = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_tok"), count(lit(1)).as("n_distinct"),
        (log2(sum("c")) -
          sum(col("c").cast(DoubleType) * log2(col("c"))) / sum("c"))
          .as("entropy"))
    val kerneled = Tables.documents(spark, sf)
      .select(col("doc_id"), Kernels.token_stats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_tok").as("k_tok"),
        col("st.n_distinct").as("k_distinct"), col("st.entropy").as("k_entropy"))
    val joined = exploded.join(kerneled, "doc_id")
    assert(joined.filter(col("n_tok") =!= col("k_tok") ||
      col("n_distinct") =!= col("k_distinct")).count() == 0)
    // summation order differs (hash map vs agg order) ⇒ ulp-level only
    assert(joined.filter(abs(col("entropy") - col("k_entropy")) > 1e-9).count() == 0)
    // empty tokens are KEPT, matching split(text, ' ') with limit -1
    val edge = spark.sql(
      """SELECT token_stats(' a  a') AS st, token_stats('') AS e""").head()
    val st = edge.getStruct(0)
    assert(st.getLong(0) == 4L && st.getLong(1) == 2L) // ['', 'a', '', 'a']
    val e = edge.getStruct(1)
    assert(e.getLong(0) == 1L && e.getLong(1) == 1L && e.getDouble(2) == 0.0)
  }

  test("interleave_bits equals the per-bit SQL formulation; range contract holds") {
    // parity vs an aggregate-over-bits formulation of the same Morton code,
    // on coordinates wide enough to exercise all 31 input bits
    val xs = spark.range(0, 2000)
      .select((col("id") * 1103515L % 2147483647L).as("x"),
        (col("id") * 2654435761L % 2147483647L).as("y"))
    val mismatch = xs.select(
      Kernels.interleave_bits(col("x"), col("y")).as("k"),
      expr("""aggregate(sequence(0, 30), 0L, (acc, i) ->
        acc + shiftleft((x >> i) & 1, 2 * i) + shiftleft((y >> i) & 1, 2 * i + 1))""").as("s"))
      .filter(col("k") =!= col("s")).count()
    assert(mismatch == 0)
    // known values, SQL surface, and the out-of-range → null contract
    val r = spark.sql(
      """SELECT interleave_bits(3L, 1L) AS a, interleave_bits(0L, 0L) AS b,
         interleave_bits(-1L, 5L) AS c, interleave_bits(2147483648L, 0L) AS d""").head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 0L)
    assert(r.isNullAt(2) && r.isNullAt(3))
    // z-order bit ordering: interleaving preserves per-dimension monotonicity
    // along each axis (y fixed, x grows ⇒ z grows; and vice versa)
    val axis = spark.range(1, 1000).select(
      (Kernels.interleave_bits(col("id"), lit(7L)) >
        Kernels.interleave_bits(col("id") - 1, lit(7L))).as("mx"),
      (Kernels.interleave_bits(lit(7L), col("id")) >
        Kernels.interleave_bits(lit(7L), col("id") - 1)).as("my"))
    assert(axis.filter(!col("mx") || !col("my")).count() == 0)
  }

  test("window_md5 equals the array_distinct(transform(md5(concat_ws(slice)))) formulation") {
    val w = split(col("text"), " ")
    val hof = when(size(w) >= 8,
      array_distinct(transform(sequence(lit(1), size(w) - 7),
        i => md5(concat_ws(" ", slice(w, i, lit(8)))))))
      .otherwise(array().cast("array<string>"))
    val mismatch = Tables.documents(spark, sf)
      .select(Kernels.window_md5(split(col("text"), " "), 8).as("k"), hof.as("ref"))
      .filter(!(col("k") <=> col("ref")))
    assert(mismatch.count() == 0)
    // short input, null tokens (concat_ws skips them), and n=1
    val edge = spark.sql(
      """SELECT window_md5(array('a','b'), 8) AS short,
                window_md5(array('a', CAST(NULL AS STRING), 'b'), 3) AS withnull,
                md5('a b') AS refnull,
                window_md5(array('x','x'), 1) AS dedup
      """).head()
    assert(edge.getSeq[String](0).isEmpty)
    assert(edge.getSeq[String](1) == Seq(edge.getString(2)))
    assert(edge.getSeq[String](3).length == 1)
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted distinct arrays") {
    // fixture-derived pairs: char-12-gram sets of consecutive docs — the
    // exact input shape x2c feeds the kernel
    val grams = array_sort(array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 11, lit(1))),
      i => col("text").substr(i, lit(12)))))
    val docs = Tables.documents(spark, sf).limit(40)
      .select(col("doc_id"), grams.as("g"))
    val pairs = docs.select(col("doc_id").as("a"), col("g").as("ga"))
      .crossJoin(docs.select(col("doc_id").as("b"), col("g").as("gb")))
      .filter(col("a") < col("b"))
    val mismatch = pairs.select(
        Kernels.sorted_intersect_size(col("ga"), col("gb")).as("k"),
        size(array_intersect(col("ga"), col("gb"))).as("ref"))
      .filter(col("k") =!= col("ref"))
    assert(mismatch.count() == 0)
    // edge cases incl nulls-last ordering and null∩null matching once
    val edge = spark.sql(
      """SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS s1,
                sorted_intersect_size(CAST(array() AS ARRAY<STRING>), array('x')) AS s2,
                sorted_intersect_size(array('a', CAST(NULL AS STRING)),
                                      array('a', CAST(NULL AS STRING))) AS s3,
                size(array_intersect(array('a', CAST(NULL AS STRING)),
                                     array('a', CAST(NULL AS STRING)))) AS ref3
      """).head()
    assert(edge.getInt(0) == 2)
    assert(edge.getInt(1) == 0)
    assert(edge.getInt(2) == edge.getInt(3))
  }

  test("rp_project equals the per-plane hofDot formulation on fixture vectors") {
    val planes = graft.ext.SimilarityQueries.rpPlanesFor(32)
    val flat: Array[Byte] = planes.flatMap(_.map(_.toByte)).toArray
    val e = Tables.embeddings(spark, sf).limit(100)
      .select(col("vec_id"), quant(col("embedding")).as("qe"))
    val hof = array(planes.map(p => hofDot(col("qe"), typedLit(p))): _*)
    val mismatch = e.select(
        (Kernels.rp_project(col("qe"), flat) <=> hof).as("eq"))
      .filter(!col("eq"))
    assert(mismatch.count() == 0)
    // null element / dim-mismatched plane table → null, never a wrong row
    import spark.implicits._
    val edge = Seq(Seq(Some(1L), None, Some(3L))).toDF("v")
      .select(Kernels.rp_project(col("v"), Array[Byte](1, -1, 1)).as("p"),
        Kernels.rp_project(col("v"), Array[Byte](1, -1)).as("m"))
      .head()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }
}
