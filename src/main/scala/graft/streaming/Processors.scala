package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** SURVEY Q51 on Spark 4's transformWithState API (the successor of
  * mapGroupsWithState): explicit named state, TTL support, RocksDB state
  * store. SYN-without-ACK tracking per key — tcp_flags is the OR of all
  * flags over the flow (`main.go:71`), so SYN=0x02 set with ACK=0x10 clear
  * marks a flow that never completed the handshake.
  *
  * A class, not a singleton: the engine stores the per-query state handle
  * on the processor instance, so each query needs its own.
  */
final class SynTrackerProcessor
    extends StatefulProcessor[String, (String, Int), (String, Long)] {
  @transient private var synCount: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    synCount = getHandle.getValueState[Long]("synCount", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Int)],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    var c = if (synCount.exists()) synCount.get() else 0L
    rows.foreach { case (_, flags) =>
      if ((flags & 2) != 0 && (flags & 16) == 0) c += 1
    }
    synCount.update(c)
    Iterator.single((key, c))
  }
}

/** Q52 dedup-at-ingest state (the BOUNDED-EMISSION shape, VERDICT r10 #1):
  * keyed by content digest, input rows are (dig, doc_id, in_index) from the
  * stream-static index probe, state is one (n_copies, first_doc) pair per
  * distinct incoming text. Each micro-batch emits EXACTLY the digests that
  * appeared in that batch — per-batch output is O(batch), never
  * O(all distinct keys) the way a complete-mode aggregation re-emission is.
  * That is the property that survives a 100 TB stream: state grows with
  * distinct content (inherent to exact dedup) but emission stays
  * proportional to arrivals.
  *
  * `in_index` is constant per digest (it comes from a static-side join on
  * the digest itself), so reading it from the current batch's rows is
  * exact — no need to persist it. The emitted (n_copies, first_doc) are
  * monotone (count grows, min shrinks), so an update-mode sink reads back
  * as last-emission-per-key via max/min — the same contract q51/q51b pin
  * in StreamingPlanSpec.
  */
final class DedupIngestProcessor
    extends StatefulProcessor[String, (String, Long, Boolean), (String, Long, Long, Boolean)] {
  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("digState",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Boolean)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Boolean)] = {
    var (n, first) = if (st.exists()) st.get() else (0L, Long.MaxValue)
    var inIndex = false
    rows.foreach { case (_, docId, idx) =>
      n += 1
      if (docId < first) first = docId
      inIndex = inIndex || idx
    }
    st.update((n, first))
    Iterator.single((key, n, first, inIndex))
  }
}
