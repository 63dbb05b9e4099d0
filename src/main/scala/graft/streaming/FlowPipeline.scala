package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.FlowSchema
import graft.functions.IpFunctions

/** The reference's ingest pipeline (SURVEY §2.1 R1–R6), Spark-native.
  *
  * Reference dataflow: UDP decoders → one Go channel (`main.go:43`) →
  * count-or-time micro-batcher (10 000 rows OR 10 s, `main.go:114-152`) →
  * single-writer ClickHouse INSERT (`main.go:157-169`), at-most-once.
  *
  * Spark mapping:
  *   - sources: any `readStream` producing the raw flow schema (files,
  *     socket, MemoryStream in tests) — fan-in is `unionByName` (R2);
  *   - R3 projection: [[normalize]], the 23-column select with IP-bytes →
  *     string rendering (`main.go:127-150`);
  *   - R4 micro-batcher: `Trigger.ProcessingTime(batchMaxTime)` bounds
  *     latency exactly like the 10 s timer; the 10 000-row cap maps to
  *     per-trigger source admission (`maxFilesPerTrigger` /
  *     `maxOffsetsPerTrigger`). Spark has no count-OR-time trigger; the
  *     time-trigger + admission-cap pair is the idiomatic equivalent and
  *     strictly bounds both batch size and latency;
  *   - R5 sink: `foreachBatch` → `df.write.jdbc` (ClickHouse) or parquet.
  *     Spark gives at-least-once vs the reference's at-most-once (errors
  *     logged + batch dropped, `main.go:158-172`); exact parity downstream
  *     is restored by the natural idempotency key
  *     (sequence_num, sampler_address, time_received);
  *   - R6 metrics: [[MetricsListener]] (rows/batches/rates), the
  *     `StreamingQueryProgress` counterpart of goflow's Prometheus counters.
  */
object FlowPipeline {

  /** R3: raw decoded flow (byte-array addresses) → the 23-column flows row.
    * The 3 address renderings are the codegen-native [[graft.functions
    * .IpRender]] expression, so the entire projection compiles into ONE
    * WholeStageCodegen span — no Scala-UDF serde boundary on the path that
    * runs at ingest rate (asserted in PlanSpec).
    */
  def normalize(raw: DataFrame): DataFrame = {
    val ip = IpFunctions.ip_render _
    // opt-in extended surface (FlowSchema.extendedFields): rendered and
    // passed through AFTER the reference's 23 columns when present, so the
    // default projection stays byte-parity with the reference
    val ext =
      if (raw.columns.contains("next_hop"))
        Seq(ip(col("next_hop")).as("next_hop"),
          col("in_if").cast("long").as("in_if"),
          col("out_if").cast("long").as("out_if"),
          col("src_as").cast("long").as("src_as"),
          col("dst_as").cast("long").as("dst_as"),
          col("vlan_id").cast("int").as("vlan_id"),
          col("mpls_1_label").cast("long").as("mpls_1_label"),
          col("mpls_1_ttl").cast("int").as("mpls_1_ttl"),
          col("src_mask").cast("int").as("src_mask"),
          col("dst_mask").cast("int").as("dst_mask"),
          col("next_hop_as").cast("long").as("next_hop_as"))
      else Seq.empty
    raw.select(Seq(
      col("type").cast("int").as("type"),
      col("time_received").cast("long").as("time_received"),
      col("sequence_num").cast("long").as("sequence_num"),
      col("sampling_rate").cast("long").as("sampling_rate"),
      col("flow_direction").cast("int").as("flow_direction"),
      ip(col("sampler_address")).as("sampler_address"),
      col("time_flow_start").cast("long").as("time_flow_start"),
      col("time_flow_end").cast("long").as("time_flow_end"),
      col("bytes").cast("long").as("bytes"),
      col("packets").cast("long").as("packets"),
      ip(col("src_addr")).as("src_addr"),
      ip(col("dst_addr")).as("dst_addr"),
      col("etype").cast("int").as("etype"),
      col("proto").cast("int").as("proto"),
      col("src_port").cast("int").as("src_port"),
      col("dst_port").cast("int").as("dst_port"),
      col("forwarding_status").cast("int").as("forwarding_status"),
      col("tcp_flags").cast("int").as("tcp_flags"),
      col("icmp_type").cast("int").as("icmp_type"),
      col("icmp_code").cast("int").as("icmp_code"),
      col("fragment_id").cast("long").as("fragment_id"),
      col("fragment_offset").cast("int").as("fragment_offset")) ++ ext: _*)
  }

  /** R1 (file-source stand-in): stream raw flow files from a directory.
    * `maxFilesPerTrigger` is the R4 batch-size admission cap.
    */
  def fileSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(FlowSchema.rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** R4+R5: run the pipeline into a parquet sink (swap the body of
    * `foreachBatch` for `batch.write.mode("append").jdbc(url, "flows",
    * props)` against ClickHouse — same plan, different writer; no JDBC
    * endpoint exists in this environment).
    */
  def start(normalized: DataFrame, outDir: String, checkpoint: String,
      batchMaxTime: String = "10 seconds", availableNow: Boolean = false,
      sinkPartitions: Int = 0): StreamingQuery = {
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(batchMaxTime)
    normalized.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // reference writes one block per batch from a single writer
        // (`main.go:258-262`); parallel partition writers are strictly more
        // capable — coalesce only if the target needs politeness.
        val out = if (sinkPartitions > 0) batch.coalesce(sinkPartitions) else batch
        out.write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** R6: rows/batches counters over StreamingQueryProgress — the Spark
    * counterpart of the reference's Prometheus `/metrics`
    * (`main.go:177-180`); expose via Spark's PrometheusServlet in a real
    * deployment.
    */
  final class MetricsListener extends StreamingQueryListener {
    val rowsIn = new LongAdder
    val batches = new LongAdder
    @volatile var lastRowsPerSecond: Double = 0.0
    /** Largest single micro-batch seen — the R4 batch-size invariant
      * (`flowsBatch ≤ BatchSize`, `main.go:119-152`) is checkable as
      * `maxBatchRows ≤ admission cap`.
      */
    @volatile var maxBatchRows: Long = 0L

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      rowsIn.add(e.progress.numInputRows)
      batches.increment()
      lastRowsPerSecond = e.progress.inputRowsPerSecond
      if (e.progress.numInputRows > maxBatchRows) maxBatchRows = e.progress.numInputRows
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
