package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table access (TESTDATA.md): one parquet file per table under the
  * scale-factor dir. Column pruning / predicate pushdown happen at the scan
  * because every query starts from these declarative reads.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (Q6 surface). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** ns → µs floor conversion of a long column named `ts`. Bare `ts div
    * 1000` truncates toward zero (wrong for pre-1970 negative nanos);
    * subtracting the positive modulus first makes the integral division a
    * true floor. `/` would detour through double (loses exactness at ns
    * magnitudes), hence SQL `div`.
    */
  def tsNanosToMicros: Column =
    expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)")

  /** `events.ts` has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark 4 rejects ([PARQUET_TYPE_ILLEGAL]) unless read as long nanos —
    * or plain TIMESTAMP(MICROS, ntz). Branch on the scanned type and
    * normalize both to a microsecond session-TZ TimestampType (sessions
    * here pin UTC, so the NTZ cast is wall-clock-identity) — identical to
    * how DuckDB/pyarrow surface the same column to the oracle (datetime is
    * µs-precision).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Normalize a scanned events frame's `ts` to µs TimestampType whichever
    * parquet encoding it arrived as (long nanos vs TIMESTAMP_NTZ µs).
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => tsNanosToMicros
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
