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
sealed class DedupIngestProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, (String, Long, Boolean), (String, Long, Long, Boolean)] {
  def this() = this(TTLConfig.NONE)

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("digState",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)

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

/** The BOUNDED-WINDOW face of dedup-at-ingest (VERDICT r11 #5): exact
  * dedup within a retention window via the state store's native TTL — the
  * production shape most streams actually run ("is this content a repeat
  * of anything seen in the last 7 days?"), where unbounded
  * O(distinct-ever) state is neither needed nor wanted. Semantics: a
  * digest whose state outlived `ttlMs` without a refresh is forgotten, so
  * its next arrival is admitted as NEW (n_copies restarts at 1,
  * first_doc resets) — precisely a rolling-window dedup. State size is
  * bounded by the window's distinct-content arrival rate instead of
  * stream lifetime; expiry is the store's own TTL cleanup (RocksDB
  * compaction-time filtering), not a scan this processor pays. Requires
  * `TimeMode.ProcessingTime()` (TTL clocks on batch processing time).
  * StreamingPlanSpec pins the expiry contract; the registered q52f drains
  * with a 7-day TTL, so against the AvailableNow oracle (a seconds-long
  * drain) it provably matches q52d's unbounded answer.
  */
final class DedupIngestTtlProcessor(ttlMs: Long)
    extends DedupIngestProcessor(TTLConfig(java.time.Duration.ofMillis(ttlMs)))

/** The q52x ADMISSION face of dedup-at-ingest: keyed by content digest,
  * state is the smallest doc_id admitted so far; a batch EMITS its
  * (dig, doc_id, text) row only when it improves that minimum (a new
  * digest, or — under replays / late micro-batch splits — a smaller id).
  * Downstream pipeline stages therefore see each distinct content at most
  * once per batch, and the FINAL admitted set is min(doc_id) per digest
  * regardless of how the stream was micro-batched — the split-invariance
  * that makes the q52x DuckDB oracle deterministic (first-arrival-wins
  * would depend on file listing order). The superseded representative's
  * downstream rows are shadowed at readback by a per-digest argmin.
  * Bounded emission like [[DedupIngestProcessor]]: per-batch output ≤
  * distinct digests IN the batch, never O(state). TTL semantics as in
  * [[DedupIngestTtlProcessor]]: an expired digest re-admits as new.
  */
final class AdmitFirstProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, (String, Long, String), (String, Long, String)] {
  def this() = this(TTLConfig.NONE)

  @transient private var minDoc: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    minDoc = getHandle.getValueState[Long]("minDoc", Encoders.scalaLong, ttl)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, String)],
      timerValues: TimerValues): Iterator[(String, Long, String)] = {
    var best: (String, Long, String) = null
    rows.foreach { r => if (best == null || r._2 < best._2) best = r }
    if (best != null && (!minDoc.exists() || best._2 < minDoc.get())) {
      minDoc.update(best._2)
      Iterator.single(best)
    } else Iterator.empty
  }
}

/** Q52r: per-user SERIES ASSEMBLY at ingest — the stateful face of x11's
  * batch first-N build. State per user = the N SMALLEST (ts, event_id)
  * points seen so far (the q32b bounded-heap discipline as keyed state:
  * capacity N per key regardless of how many events the user's history
  * streams — a collect-everything state would grow with history, the
  * telemetry skew trap the batch form's row_number prune avoids), plus a
  * MONOTONE seen counter so an update-mode sink reads back as
  * last-emission-per-key (max seen per user; q51/q51b's contract). The
  * final state is the N smallest points of the whole stream regardless of
  * micro-batch split — merge-then-truncate is associative — so the drained
  * series equals the batch build's exactly.
  */
final case class SeriesState(ts: Array[Long], ids: Array[Long], vs: Array[Double])

/** `seen` is monotone per key — UNTIL a state TTL expires the key, after
  * which it restarts (r16 review: a post-expiry emission with a SMALLER
  * seen must still win the readback, or the sink serves the user's stale
  * pre-expiry series forever). `emit_seq` is the TTL-safe readback key
  * (ADVICE r16): a STRICTLY MONOTONE per-key emission counter backed by
  * TTL-free state, so last-emission-per-key = max(emit_seq) holds across
  * expiry with no reliance on distinct data batches never sharing a
  * wall-clock millisecond (the r16 `(as_of, seen)` ordering held only
  * because the 200 ms drain trigger happened to guarantee that — nothing
  * tied the two). The counter is the ONLY TTL-free state — 8 bytes per
  * user ever seen, a deliberate trade: the window semantics (series
  * forgotten wholesale) live in the TTL'd states, and a deployment that
  * must also retire the counter would attach a cleanup timer, not weaken
  * the readback. `as_of` (batch processing time; −1 under
  * `TimeMode.None`) stays for observability.
  */
final case class SeriesEmit(user_id: Long, seen: Long, complete: Boolean,
    vals: Array[Double], as_of: Long, emit_seq: Long)

sealed abstract class SeriesAssemblerBase(n: Int, recent: Boolean, ttl: TTLConfig)
    extends StatefulProcessor[Long, (Long, Long, Long, Double), SeriesEmit] {

  @transient private var st: ValueState[SeriesState] = _
  @transient private var seen: ValueState[Long] = _
  @transient private var emitSeq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[SeriesState]("series",
      Encoders.product[SeriesState], ttl)
    seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)
    // TTL-FREE on purpose — see the SeriesEmit scaladoc
    emitSeq = getHandle.getValueState[Long]("emitSeq", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long, Double)],
      timerValues: TimerValues): Iterator[SeriesEmit] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    if (st.exists()) {
      val cur = st.get()
      var i = 0
      while (i < cur.ts.length) {
        buf += ((cur.ts(i), cur.ids(i), cur.vs(i))); i += 1
      }
    }
    var c = if (seen.exists()) seen.get() else 0L
    rows.foreach { case (_, t, id, v) => buf += ((t, id, v)); c += 1 }
    // kept points stay in ASCENDING (ts, event_id) order either way —
    // the emitted vals are a series, and series order is the semantics
    val sorted = buf.sortBy(p => (p._1, p._2))
    val kept = if (recent) sorted.takeRight(n) else sorted.take(n)
    st.update(SeriesState(kept.map(_._1).toArray, kept.map(_._2).toArray,
      kept.map(_._3).toArray))
    seen.update(c)
    val asOf = try timerValues.getCurrentProcessingTimeInMs()
      catch { case _: UnsupportedOperationException => -1L }
    val seq = (if (emitSeq.exists()) emitSeq.get() else 0L) + 1L
    emitSeq.update(seq)
    Iterator.single(SeriesEmit(key, c, kept.length == n,
      kept.map(_._3).toArray, asOf, seq))
  }
}

final class SeriesAssemblerProcessor(n: Int)
    extends SeriesAssemblerBase(n, recent = false, TTLConfig.NONE)

/** The SLIDING face of series assembly (r16, VERDICT r15 #4): state per
  * user = the N MOST-RECENT (ts, event_id) points — what a live monitor
  * actually serves — under a state TTL, so a user idle past the window
  * is forgotten wholesale (the q52f rolling-window discipline; requires
  * `TimeMode.ProcessingTime`). Merge-then-truncate to the N largest is
  * associative exactly like the first-N form, so the drained series
  * equals the batch last-N build under any micro-batch split; points are
  * kept and emitted in ascending series order regardless.
  */
final class RecentSeriesAssemblerProcessor(n: Int, ttl: TTLConfig)
    extends SeriesAssemblerBase(n, recent = true, ttl)
