package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q52g's sink device under crash-retry: the per-batchId OVERWRITE
  * directory (`batch=<id>`) must compose with checkpointed replay to
  * effectively-once — a batch that dies after writing a PARTIAL directory
  * replays whole on restart and REPLACES its own files, where a
  * mode-append sink would have double-appended the surviving prefix.
  * Mirror of StreamRestartSpec (the JDBC idempotentAppend face of the
  * same contract), in columnar form.
  */
class AnnIngestRestartSpec extends SparkSpec {

  test("crash after partial batch dir, restart overwrites: exactly-once rows") {
    val out = s"${graft.Tmp.root}/annrestart-out"
    val cp = s"${graft.Tmp.root}/cp/annrestart"
    FileUtils.deleteQuietly(new java.io.File(out))
    FileUtils.deleteQuietly(new java.io.File(cp))

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val injected = new AtomicBoolean(false)

    def writer(b: DataFrame, id: Long): Unit = {
      val rows = b.select(col("value").as("vec_id"))
      if (id == 1L && !injected.getAndSet(true)) {
        // crash mid-batch: half the batch's files land in batch=1, then
        // the function dies before the offset commit
        rows.filter(col("vec_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$out/batch=$id")
        throw new RuntimeException("injected crash after partial batch dir")
      }
      rows.write.mode("overwrite").parquet(s"$out/batch=$id")
    }

    def start() = ms.toDF().writeStream
      .option("checkpointLocation", cp)
      .foreachBatch(writer _)
      .start()

    ms.addData(1L to 50L)
    val q1 = start()
    q1.processAllAvailable() // batch 0 commits cleanly
    ms.addData(51L to 100L) // batch 1 hits the injected crash
    intercept[Exception] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(!q1.isActive, "query must have died on the injected crash")

    // restart against the SAME checkpoint: batch 1 never committed, so it
    // replays whole and the overwrite replaces the partial directory
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out).select("vec_id")
    assert(got.count() == 100L,
      s"expected exactly-once delivery of 100 rows, got ${got.count()}")
    assert(got.distinct().count() == 100L,
      "duplicates: the partial batch directory was appended, not replaced")
    assert(injected.get(), "the crash injection never fired")
  }
}
