package graft.ext

import java.nio.file.Paths

import org.apache.commons.io.FileUtils

import graft.{Registry, SparkSpec}

/** x6n apportionment properties on RANDOMIZED source distributions (the
  * fixture exercises one 20-source shape; this drives the largest-
  * remainder math across skewed / tiny / near-uniform shapes with a
  * seeded generator and re-derives the quota arithmetic independently in
  * Scala):
  *   1. quotas sum EXACTLY to ⌊N/5⌋ — the contract a Bernoulli sampler
  *      cannot meet;
  *   2. every quota is base or base+1, base = ⌊target·iw/W⌋ — largest
  *      remainder never strays further;
  *   3. the +1s go to the largest remainders (ties → source ascending) —
  *      no source with a smaller remainder is promoted over a larger one;
  *   4. every source fills its quota EXACTLY (n_sampled == quota) — the
  *      with-repetition contract: a tiny up-weighted source whose quota
  *      exceeds its size cycles its docs rather than under-filling (this
  *      spec's skew case CAUGHT the original cutoff formulation
  *      delivering 1 of an 11-doc quota from a 1-doc source).
  */
class TemperatureMixSpec extends SparkSpec {

  private val dir = s"${graft.Tmp.root}/tmix-corpus"

  private def writeCorpus(sizes: Map[String, Int]): String = {
    FileUtils.deleteQuietly(Paths.get(dir).toFile)
    import spark.implicits._
    var id = 0L
    val rows = sizes.toSeq.sortBy(_._1).flatMap { case (src, n) =>
      (0 until n).map { _ => id += 1; (id, s"doc $id", "en", src, 10L) }
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def check(sizes: Map[String, Int]): Unit = {
    val d = writeCorpus(sizes)
    val out = Registry.queries("x6n_temperature_mix")(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSet == sizes.keySet)
    val total = out.map(_._2).sum
    val target = total / 5
    // independent re-derivation of the integer apportionment
    val iw = out.map { case (s, n, w, _, _) =>
      val expect = math.floor(math.sqrt((n * 1000000L).toDouble)).toLong
      assert(w == expect, s"$s weight $w != $expect"); s -> w
    }.toMap
    val wsum = iw.values.sum
    val base = out.map { case (s, _, w, _, _) => s -> target * w / wsum }.toMap
    val rem = out.map { case (s, _, w, _, _) => s -> target * w % wsum }.toMap
    assert(out.map(_._4).sum == target,
      s"quota sum ${out.map(_._4).sum} != target $target for $sizes")
    out.foreach { case (s, n, _, q, sampled) =>
      assert(q == base(s) || q == base(s) + 1, s"$s quota $q outside base ${base(s)}+1")
      // with-repetition: the quota is met EXACTLY even when it exceeds
      // the source size (docs cycle — the epochs semantics)
      assert(sampled == q, s"$s sampled $sampled != quota $q (n=$n)")
    }
    // promotion order: sort by (rem desc, source asc); the promoted set
    // must be exactly a prefix
    val order = out.map(_._1).sortBy(s => (-rem(s), s))
    val promoted = out.filter { case (s, _, _, q, _) => q == base(s) + 1 }.map(_._1).toSet
    val prefix = order.take(promoted.size).toSet
    assert(promoted == prefix, s"promoted $promoted is not the remainder-order prefix $prefix")
  }

  test("skewed, tiny, near-uniform, and randomized source distributions") {
    check(Map("giant" -> 5000, "mid" -> 500, "tiny" -> 7, "one" -> 1))
    check(Map("a" -> 100, "b" -> 100, "c" -> 100))
    check((0 until 11).map(i => f"s$i%02d" -> (50 + i * 37)).toMap)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3)
      check((0 until 8).map(i => f"r$i%02d" -> (1 + rnd.nextInt(2000))).toMap)
  }
}
