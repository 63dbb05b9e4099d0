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

  /** Fan a narrow-split input out to every core before an expensive
    * per-row kernel chain (r18, guide §2.5 "input skew"): the fixture
    * tables arrive as ONE single-row-group parquet file, so everything
    * upstream of the first exchange — explodes, codegen kernels, codec
    * calls — runs in a SINGLE task regardless of cluster size (measured:
    * 0.3–4.4 s one-task jobs across qf6, x3g, the x4 BPE family and the
    * x5 codec family at sf0.1 on 32 cores). Conditional, so it stays
    * honest at production scale: when
    * the input already carries at least `defaultParallelism` partitions
    * (a real multi-split scan), this is the identity and adds NO exchange
    * — the repartition only exists to undo the degenerate one-split
    * layout. Hash-partitioned on `key` — deterministic under task retry
    * (guide §2.5's round-robin-repartition replay hazard does not apply).
    */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    // streaming frames can't answer getNumPartitions (no batch RDD yet);
    // their micro-batch parallelism is the source's admission knob, not a
    // scan-split artifact — leave them untouched
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (scanSplitEstimate(df) >= p) df else df.repartition(p, key)
  }

  /** Estimated file-scan split count of `df`'s leaf relations — the
    * narrow-split test [[fanOut]] gates on, WITHOUT `df.rdd` (ADVICE r18:
    * the RDD probe forced a second full physical planning per call and
    * read the pre-AQE count). Every fanOut call site sits directly above
    * a base-table parquet scan, so the split count is a pure function of
    * the leaf files and the three split confs — the same
    * `min(maxPartitionBytes, max(openCost, totalBytes/minPartitionNum))`
    * packing Spark's FilePartition planner applies. The estimate only
    * steers a perf decision: at production scale totalBytes dwarfs
    * maxSplitBytes, the estimate is ≥ parallelism, and fanOut is the
    * identity exactly as before. Non-file leaves (planted in-memory
    * frames) fall back to the old RDD probe.
    */
  private def scanSplitEstimate(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val fileBytes: Seq[Option[Seq[Long]]] = leaves.map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.listFiles(Nil, Nil)
            .flatMap(_.files.map(_.getLen)).filter(_ > 0).toSeq)
        case _ => None
      }
      case _ => None
    }
    if (fileBytes.exists(_.isEmpty))
      return df.rdd.getNumPartitions.toLong // non-file leaf: old probe
    val files: Seq[Long] = fileBytes.flatMap(_.get)
    if (files.isEmpty) return 1L
    val openCost = conf.filesOpenCostInBytes
    val minParts = conf.filesMinPartitionNum
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val totalBytes = files.map(_ + openCost).sum
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, totalBytes / math.max(1, minParts)))
    // each file contributes ceil(len/maxSplit) splits; bin-packing can
    // only merge sub-maxSplit tails, so this upper bound is tight on the
    // single-file fixture tables and conservative (≥ actual) in general —
    // an over-estimate skips the repartition, never adds one
    files.map(len => (len + maxSplit - 1) / maxSplit).sum
  }
}
