package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x6p's distribution invariant (the x6k/x6m lesson, machine-checked for
  * every prefix-sum operator): the packed sequences must be a pure
  * function of the token stream's canonical order — never of how the
  * two-phase prefix sum happened to range-partition the doc offsets.
  */
class PackTokensSpec extends SparkSpec {

  test("packed sequences are invariant to the prefix-sum partition count") {
    val base = graft.Registry.queries("x6p_pack_tokens")(spark, sf)
      .orderBy("seq_id").collect().map(_.toString).toSeq
    assert(base.nonEmpty)
    // same plan, different shuffle parallelism for the offset phase: the
    // range partitioning (and spark_partition_id values) change, the
    // output must not
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val alt = graft.Registry.queries("x6p_pack_tokens")(spark, sf)
        .orderBy("seq_id").collect().map(_.toString).toSeq
      assert(alt == base, "pack output depends on shuffle partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sequences tile the corpus: full 64-token sequences plus one tail") {
    val rows = graft.Registry.queries("x6p_pack_tokens")(spark, sf)
      .orderBy("seq_id").collect()
    val nTok = rows.map(_.getLong(1)).sum
    // every sequence but the last is exactly 64 tokens; ids contiguous
    rows.init.foreach(r => assert(r.getLong(1) == 64L, r.toString))
    assert(rows.last.getLong(1) <= 64L)
    assert(rows.map(_.getLong(0)).toSeq == rows.indices.map(_.toLong))
    // and the total equals the corpus subword count (x4l's aggregate)
    val total = TextQueries.bpeTokenStream(spark, sf).count()
    assert(nTok == total)
  }
}
