package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness (not registered; deleted before commit).
object ProfileTmp {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(plans.GraftExtensions.install)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def noop(name: String): Unit = time(name) {
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
    }

    // warmup
    noop("q01_scan_parquet"); noop("q20_agg_hash")

    args.headOption.getOrElse("x2") match {
      case "x2" =>
        noop("x2_dedup_minhash")
        noop("x2_dedup_minhash")
      case "x7b" =>
        noop("x7b_repetition"); noop("x7b_repetition")
      case "q52b" =>
        noop("q52b_stream_stream_join"); noop("q52b_stream_stream_join")
      case "x2d" =>
        noop("x2d_dedup_components")
      case n =>
        noop(n); noop(n)
    }
    spark.stop()
  }
}
