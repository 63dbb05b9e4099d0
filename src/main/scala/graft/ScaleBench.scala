package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress gate (VERDICT r07 #1): every 100 TB claim in SURVEY §2.3
  * was architecture-verified but measured only at sf0.1 — this main
  * synthesizes a DETERMINISTIC ~10× fixture (`target/sfgen/sf1`) by
  * replicating the sf0.1 tables with shifted keys, runs the scale-path
  * query set on both scales under the capped-memory session sbt launches
  * (`SPARK_DRIVER_MEM`), and writes `BENCH_SCALE.json` with per-query
  * growth ratios plus the x6g partition-count-invariance check.
  *
  * Replication rules (all pure column arithmetic — rerunnable bit-identical):
  *   - documents ×10, doc_id shifted, text UNCHANGED — every original doc
  *     becomes a 10-copy exact-duplicate group, the crawl-corpus shape the
  *     r08 exact-dup collapse defends against, so the dedup family is
  *     measured under realistic duplication, not an artificially
  *     dupe-free corpus;
  *   - embeddings ×10, vec_id shifted, replicas perturbed by +k·0.001 per
  *     element (distinct vectors, neighborhoods preserved); query vectors
  *     stay `vec_id < 8`, so ANN scans 10× corpus at fixed query count;
  *   - events ×10, event_id shifted, user_id/ts unchanged — qf6's hot
  *     dst_port keys get 10× hotter, which is the point;
  *   - lineitem/orders ×10, orderkeys shifted by the SAME offset so each
  *     replica joins within itself (join selectivity preserved).
  *
  * "~linear growth" gate: scaled/base wall-clock ratio per query must stay
  * under `MaxRatio` (20× for 10× data — generous headroom for fixed
  * per-query overheads and the duplication-induced extra output, but two
  * orders of magnitude below what any quadratic path would produce).
  */
object ScaleBench {

  private val Scale = 10
  private val MaxRatio = 20.0

  /** The scale-path set named by VERDICT r07 #1. */
  private val scaleSet = Seq(
    "x2_dedup_minhash", "x2b_dedup_simhash", "x2e_dedup_embed", "x2f_cc_star",
    "x6g_shard_pack", "x7d_decontam_bloom",
    "x3c_knn_ivf", "x3f_pq_adc", "x3g_sq8",
    "q12b_join_bucketed", "qf6_salted_join")

  private def generate(spark: SparkSession, base: String, out: String): Unit = {
    Files.createDirectories(Paths.get(out))
    val ks = (0 until Scale).map(_.toLong)

    def reps(df: DataFrame)(shift: (DataFrame, Long) => DataFrame): DataFrame =
      ks.map(k => shift(df, k)).reduce(_ unionByName _)

    // exact-duplicate replicas: the crawl shape (see scaladoc)
    reps(spark.read.parquet(s"$base/documents.parquet")) { (df, k) =>
      df.withColumn("doc_id", col("doc_id") + k * 10000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    reps(spark.read.parquet(s"$base/embeddings.parquet")) { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + k * 10000000L)
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(k * 0.001f)))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events.ts is parquet TIMESTAMP(NANOS): read it as raw longs (the
    // same nanosAsLong surface Tables.events uses) and write plain BIGINT
    // nanos — tsNanosToMicros floors identically over either encoding
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reps(spark.read.parquet(s"$base/events.parquet")) { (df, k) =>
      df.withColumn("event_id", col("event_id") + k * 100000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    reps(spark.read.parquet(s"$base/lineitem.parquet")) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + k * 100000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    reps(spark.read.parquet(s"$base/orders.parquet")) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + k * 100000000L)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")

    // small dims pass through unscaled (they are dims at every scale)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "/root/repo/target/sfgen/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(plans.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!Files.exists(Paths.get(s"$out/documents.parquet"))) {
      System.err.println(s"[scale] generating ${Scale}x fixture at $out")
      generate(spark, base, out)
    }

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[scale] $name failed on $dir: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    run("q01_scan_parquet", base); run("q20_agg_hash", base) // warmup

    // min-of-2 per (query, scale) — same robust estimator as Bench
    val rows = scaleSet.map { n =>
      val b = math.min(run(n, base), run(n, base))
      val s = math.min(run(n, out), run(n, out))
      val ratio = if (b > 0 && s > 0) s / b else -1.0
      System.err.println(f"[scale] $n%-24s base $b%7.2f s  x$Scale $s%7.2f s  ratio ${ratio}%6.2f")
      (n, b, s, ratio)
    }

    // x6g's own claimed invariant: byte-budget shard packing must be
    // partition-count independent — identical rows under different
    // shuffle widths at the scaled size
    val x6g = "x6g_shard_pack"
    def x6gRows(parts: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries(x6g)(spark, out).collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val invariant = x6gRows("8") == x6gRows("64")

    val ok = rows.forall { case (_, b, s, r) => b > 0 && s > 0 && r <= MaxRatio }
    val json = {
      val qs = rows.map { case (n, b, s, r) =>
        f""""$n":{"base_sec":$b%.3f,"scaled_sec":$s%.3f,"ratio":$r%.3f}"""
      }.mkString("{", ",", "}")
      val maxR = rows.map(_._4).max
      s"""{"metric":"scale_stress","scale":$Scale,"base":"$base","scaled":"$out",""" +
        s""""driver_mem":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",""" +
        f""""max_ratio":$maxR%.3f,"max_ratio_allowed":$MaxRatio,"linear_ok":$ok,""" +
        s""""x6g_partition_invariant":$invariant,"queries":$qs}"""
    }
    Files.write(Paths.get("/root/repo/BENCH_SCALE.json"),
      json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
    if (!ok || !invariant) sys.exit(1)
  }
}
