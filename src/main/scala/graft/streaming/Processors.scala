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
