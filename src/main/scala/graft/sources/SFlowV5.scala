package graft.sources

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

/** sFlow v5 wire codec — the decoder behind the reference's `sflow://` UDP
  * listener (`main.go:228-231`, goflow `StateSFlow`). sFlow differs from
  * NetFlow structurally: the datagram carries SAMPLES, and each flow
  * sample embeds the RAW PACKET HEADER of the sampled frame — so decoding
  * a flow means dissecting Ethernet → (802.1Q) → IPv4/IPv6 → TCP/UDP/ICMP
  * from the captured bytes, exactly what goflow's sflow producer does.
  *
  * Datagram (XDR, all u32 big-endian):
  *   version=5, agentAddressType (1=v4: 4B, 2=v6: 16B), agentAddress,
  *   subAgentId, sequence, uptimeMs, numSamples, then samples:
  *     sampleType(u32: enterprise<<12|format), sampleLen(u32), body
  *   flow sample (format 1): seq, sourceId, samplingRate, samplePool,
  *     drops, input, output, numRecords
  *   expanded flow sample (format 3): seq, sourceIdType, sourceIdIndex,
  *     samplingRate, samplePool, drops, inputFormat, inputValue,
  *     outputFormat, outputValue, numRecords
  *   record: recordType(u32), recordLen(u32); raw packet header record
  *     (format 1): headerProtocol(u32, 1=Ethernet), frameLength(u32),
  *     stripped(u32), headerLen(u32), header bytes padded to 4
  *
  * FlowMessage mapping follows goflow: type=1 (SFLOW_5), bytes =
  * frameLength, packets = 1 (each sample is one sampled frame),
  * sequence_num = datagram sequence, sampling_rate from the sample, and —
  * sFlow carries no export timestamp — time fields are the RECEIVE time,
  * passed in by the caller so tests stay deterministic. Samples that are
  * not flow samples, records that are not raw headers, and non-IP frames
  * are skipped by length (counter samples are a different metrics surface).
  */
object SFlowV5 {

  def decode(packet: Array[Byte], sampler: Array[Byte],
      nowSecs: Long): Seq[NetFlowV5.RawFlow] = {
    val bb = ByteBuffer.wrap(packet)
    require(packet.length >= 28, s"short sFlow datagram: ${packet.length}")
    val version = bb.getInt
    require(version == 5, s"not sFlow v5: version=$version")
    val agentType = bb.getInt
    bb.position(bb.position() + (if (agentType == 2) 16 else 4)) // agent addr
    bb.getInt // subAgentId
    val sequence = bb.getInt & 0xffffffffL
    bb.getInt // uptime
    val numSamples = bb.getInt
    val out = ArrayBuffer.empty[NetFlowV5.RawFlow]

    var s = 0
    while (s < numSamples && bb.remaining() >= 8) {
      val sampleType = bb.getInt & 0xffffffffL
      val sampleLen = bb.getInt
      val sampleEnd = bb.position() + sampleLen
      require(sampleLen >= 0 && sampleEnd <= packet.length,
        s"malformed sample: len=$sampleLen")
      val format = (sampleType & 0xfff).toInt
      val enterprise = (sampleType >> 12).toInt
      if (enterprise == 0 && (format == 1 || format == 3)) {
        // the fixed flow-sample fields must fit the DECLARED sample length
        // (32B plain / 44B expanded) — a short tail sample would otherwise
        // underflow with an exception the caller does not treat as
        // malformed input
        val fixed = if (format == 1) 32 else 44
        require(sampleLen >= fixed,
          s"short flow sample: len=$sampleLen < $fixed")
        bb.getInt // sample sequence
        if (format == 1) bb.getInt // sourceId
        else { bb.getInt; bb.getInt } // sourceIdType, sourceIdIndex
        val samplingRate = bb.getInt & 0xffffffffL
        bb.getInt // samplePool
        bb.getInt // drops
        // input/output interface (extended surface): plain samples carry
        // 2-bit format + 30-bit value in one word; expanded samples carry
        // (format, value) word pairs. In BOTH layouts only format 0 means
        // ifIndex — format 1 is "discarded: value=reason", format 2 is
        // "multiple: value=count" — so a non-zero format prefix must leave
        // the ifIndex 0 rather than misread the value as an interface.
        var inIf = 0; var outIf = 0
        if (format == 1) {
          val inW = bb.getInt; val outW = bb.getInt
          if ((inW >>> 30) == 0) inIf = inW & 0x3fffffff
          if ((outW >>> 30) == 0) outIf = outW & 0x3fffffff
        } else {
          val inFmt = bb.getInt; val inVal = bb.getInt
          val outFmt = bb.getInt; val outVal = bb.getInt
          if (inFmt == 0) inIf = inVal
          if (outFmt == 0) outIf = outVal
        }
        val numRecords = bb.getInt
        // two-pass over the sample's records: the raw-header record (fmt 1)
        // yields the flow; the extended-router record (fmt 1002: next-hop
        // address + src/dst prefix lengths — sFlow v5 §7) decorates it.
        // Record ORDER inside a sample is not specified, so buffer the
        // dissected flows and apply the decoration after the loop.
        val sampleFlows = scala.collection.mutable.ArrayBuffer.empty[NetFlowV5.RawFlow]
        var extNextHop: Array[Byte] = null
        var srcMask = 0; var dstMask = 0
        var gwSrcAs = 0L; var gwDstAs = 0L; var gwNextHopAs = 0L
        var haveGateway = false
        var r = 0
        while (r < numRecords && bb.position() + 8 <= sampleEnd) {
          val recType = bb.getInt & 0xffffffffL
          val recLen = bb.getInt
          val recEnd = bb.position() + recLen
          require(recLen >= 0 && recEnd <= sampleEnd, s"malformed record: len=$recLen")
          if ((recType >> 12) == 0) (recType & 0xfff).toInt match {
            case 1 if recLen >= 16 =>
              val headerProtocol = bb.getInt
              val frameLength = bb.getInt & 0xffffffffL
              bb.getInt // stripped
              val headerLen = bb.getInt
              if (headerProtocol == 1 && bb.position() + headerLen <= recEnd) {
                dissectEthernet(bb, bb.position(), headerLen, sampler, nowSecs,
                  sequence, samplingRate, frameLength)
                  .foreach(sampleFlows += _)
              }
            case 1002 if recLen >= 16 =>
              // struct extended_router: next_hop (u32 addr type + 4/16 B),
              // src_mask_len (u32), dst_mask_len (u32)
              val addrType = bb.getInt
              val addrLen = if (addrType == 1) 4 else if (addrType == 2) 16 else -1
              if (addrLen > 0 && bb.position() + addrLen + 8 <= recEnd) {
                val nh = new Array[Byte](addrLen); bb.get(nh)
                extNextHop = nh
                srcMask = bb.getInt & 0xff
                dstMask = bb.getInt & 0xff
              }
            case 1003 if recLen >= 24 =>
              // struct extended_gateway: next_hop (u32 addr type + 4/16 B),
              // as (router's own AS, u32), src_as (u32), src_peer_as (u32),
              // dst_as_path (u32 n_segments; each: u32 type, u32 len,
              // len × u32 AS). The BGP semantics goflow surfaces:
              // src_as/dst_as from the gateway (the raw-header dissection
              // cannot see AS numbers), next_hop_as = the FIRST AS of the
              // dst path (the BGP neighbor); dst_as = the LAST AS of the
              // last segment (the destination's AS). Empty-path and
              // zero-src fallbacks go to the ROUTER's AS (a locally-
              // originated route's destination is the router's own AS —
              // goflow does the same). Path parsing is bounds-checked per
              // word; a truncated path keeps whatever prefix was whole.
              val addrType = bb.getInt
              val addrLen = if (addrType == 1) 4 else if (addrType == 2) 16 else -1
              if (addrLen > 0 && bb.position() + addrLen + 12 <= recEnd) {
                val nh = new Array[Byte](addrLen); bb.get(nh)
                if (extNextHop == null) extNextHop = nh // 1002 wins if both
                val routerAs = bb.getInt & 0xffffffffL
                gwSrcAs = bb.getInt & 0xffffffffL
                if (gwSrcAs == 0L) gwSrcAs = routerAs
                bb.getInt // src_peer_as: superseded by the path head below
                haveGateway = true
                gwDstAs = routerAs // empty-path fallback (overwritten below)
                if (bb.position() + 4 <= recEnd) {
                  val nSegs = bb.getInt
                  var seg = 0
                  var first = true
                  while (seg < nSegs && bb.position() + 8 <= recEnd) {
                    bb.getInt // segment type (SET/SEQUENCE)
                    val segLen = bb.getInt
                    var i = 0
                    while (i < segLen && bb.position() + 4 <= recEnd) {
                      val as = bb.getInt & 0xffffffffL
                      if (first) { gwNextHopAs = as; first = false }
                      gwDstAs = as // last seen AS = destination AS
                      i += 1
                    }
                    seg += 1
                  }
                }
              }
            case _ => // other flow-record formats: skip by length
          }
          bb.position(recEnd)
          r += 1
        }
        sampleFlows.foreach { f =>
          out += f.copy(in_if = inIf, out_if = outIf,
            next_hop = if (extNextHop != null) extNextHop else f.next_hop,
            src_mask = srcMask, dst_mask = dstMask,
            src_as = if (haveGateway) gwSrcAs else f.src_as,
            dst_as = if (haveGateway) gwDstAs else f.dst_as,
            next_hop_as = gwNextHopAs)
        }
      }
      bb.position(sampleEnd)
      s += 1
    }
    out.toSeq
  }

  /** Ethernet frame dissection (802.1Q-aware) → one RawFlow if the frame
    * carries IPv4/IPv6; None for ARP & friends (goflow skips those too).
    */
  private def dissectEthernet(bb: ByteBuffer, start: Int, headerLen: Int,
      sampler: Array[Byte], nowSecs: Long, sequence: Long, samplingRate: Long,
      frameLength: Long): Option[NetFlowV5.RawFlow] = {
    def u8(off: Int): Int = bb.get(start + off) & 0xff
    def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    def bytesAt(off: Int, n: Int): Array[Byte] =
      (0 until n).map(i => bb.get(start + off + i)).toArray
    if (headerLen < 14) return None
    var et = u16(12)
    var l3 = 14
    var vlanId = 0
    if (et == 0x8100 && headerLen >= 18) { // 802.1Q tag: TCI low 12 bits
      vlanId = u16(14) & 0xfff
      et = u16(16); l3 = 18
    }
    // MPLS shim stack (ethertype 0x8847 unicast / 0x8848 multicast): each
    // entry label(20) | exp(3) | bos(1) | ttl(8); keep the TOP entry, pop
    // to the bottom-of-stack, then infer the inner protocol from the IP
    // version nibble (the shim carries no inner ethertype)
    var mplsLabel = 0L; var mplsTtl = 0
    if (et == 0x8847 || et == 0x8848) {
      if (headerLen < l3 + 4) return None
      mplsLabel = ((u16(l3).toLong << 4) | (u8(l3 + 2) >> 4)) & 0xfffffL
      mplsTtl = u8(l3 + 3)
      var bos = (u8(l3 + 2) & 1) == 1
      l3 += 4
      while (!bos && headerLen >= l3 + 4) {
        bos = (u8(l3 + 2) & 1) == 1
        l3 += 4
      }
      if (!bos || headerLen < l3 + 1) return None
      et = (u8(l3) >> 4) match {
        case 4 => 0x800
        case 6 => 0x86dd
        case _ => return None // non-IP MPLS payload
      }
    }

    var proto = 0; var srcAddr: Array[Byte] = null; var dstAddr: Array[Byte] = null
    var l4 = 0; var fragId = 0L; var fragOffset = 0
    if (et == 0x800) { // IPv4
      if (headerLen < l3 + 20) return None
      val ihl = (u8(l3) & 0xf) * 4
      proto = u8(l3 + 9)
      fragId = u16(l3 + 4).toLong
      fragOffset = ((u8(l3 + 6) & 0x1f) << 8) | u8(l3 + 7)
      srcAddr = bytesAt(l3 + 12, 4); dstAddr = bytesAt(l3 + 16, 4)
      l4 = l3 + ihl
    } else if (et == 0x86dd) { // IPv6 (fixed header; ext headers skipped as goflow does)
      if (headerLen < l3 + 40) return None
      proto = u8(l3 + 6)
      srcAddr = bytesAt(l3 + 8, 16); dstAddr = bytesAt(l3 + 24, 16)
      l4 = l3 + 40
    } else return None // non-IP frame

    var srcPort = 0; var dstPort = 0; var tcpFlags = 0
    var icmpType = 0; var icmpCode = 0
    if ((proto == 6 || proto == 17) && headerLen >= l4 + 4) {
      srcPort = u16(l4); dstPort = u16(l4 + 2)
      if (proto == 6 && headerLen >= l4 + 14) tcpFlags = u8(l4 + 13) & 0x3f
    } else if ((proto == 1 || proto == 58) && headerLen >= l4 + 2) {
      icmpType = u8(l4); icmpCode = u8(l4 + 1)
    }

    Some(NetFlowV5.RawFlow(
      `type` = 1, // goflow SFLOW_5
      time_received = nowSecs,
      sequence_num = sequence,
      sampling_rate = samplingRate,
      flow_direction = 0,
      sampler_address = sampler,
      time_flow_start = nowSecs, // sFlow samples carry no flow timestamps
      time_flow_end = nowSecs,
      bytes = frameLength,
      packets = 1L,
      src_addr = srcAddr,
      dst_addr = dstAddr,
      etype = et,
      proto = proto,
      src_port = srcPort,
      dst_port = dstPort,
      forwarding_status = 0,
      tcp_flags = tcpFlags,
      icmp_type = icmpType,
      icmp_code = icmpCode,
      fragment_id = fragId,
      fragment_offset = fragOffset,
      vlan_id = vlanId,
      mpls_1_label = mplsLabel,
      mpls_1_ttl = mplsTtl))
  }

  /** Generic interface counters from an sFlow COUNTER sample (struct
    * counter_record format 1 — the standard 88-byte if-counters block).
    * Counter samples are the OTHER half of sFlow: periodic interface
    * statistics next to the packet samples. They never become flows rows —
    * goflow skips them — but a real collector surfaces them as metrics,
    * so the receiver parses them into [[UdpFlowSource.ifCounters]] and the
    * Prometheus endpoint exports them as gauges.
    */
  final case class IfCounters(ifIndex: Long, ifSpeed: Long, ifInOctets: Long,
      ifInUcastPkts: Long, ifInErrors: Long, ifOutOctets: Long,
      ifOutUcastPkts: Long, ifOutErrors: Long)

  /** struct ethernet_counters (sFlow v5 §5, format 2): the 13 dot3Stats
    * u32s, attributed to the sample's source index (ethernet records carry
    * no ifIndex of their own). goflow v3.4.5 decodes the same block.
    */
  final case class EthernetCounters(alignmentErrors: Long, fcsErrors: Long,
      singleCollisionFrames: Long, multipleCollisionFrames: Long,
      sqeTestErrors: Long, deferredTransmissions: Long, lateCollisions: Long,
      excessiveCollisions: Long, internalMacTransmitErrors: Long,
      carrierSenseErrors: Long, frameTooLongs: Long,
      internalMacReceiveErrors: Long, symbolErrors: Long)

  /** struct vlan_counters (format 5): per-VLAN octet/packet/discard tallies. */
  final case class VlanCounters(vlanId: Long, octets: Long, ucastPkts: Long,
      multicastPkts: Long, broadcastPkts: Long, discards: Long)

  /** struct processor (format 1001): agent CPU and memory gauges. */
  final case class ProcessorCounters(cpu5s: Long, cpu1m: Long, cpu5m: Long,
      totalMemory: Long, freeMemory: Long)

  /** All counter records of one datagram; ethernet records keyed by their
    * sample's source index.
    */
  final case class CounterRecords(
      ifc: Seq[IfCounters] = Nil,
      eth: Seq[(Long, EthernetCounters)] = Nil,
      vlan: Seq[VlanCounters] = Nil,
      proc: Seq[ProcessorCounters] = Nil) {
    def nonEmpty: Boolean =
      ifc.nonEmpty || eth.nonEmpty || vlan.nonEmpty || proc.nonEmpty
  }

  /** Parse the counter samples of one datagram. Returns (agentAddress,
    * counters, hasFlowSamples) — the agent address is the metrics label (a
    * sub-agent/proxy's datagrams carry the true agent, not the UDP
    * sender); the flag lets the receiver refuse buffer admission for
    * counters-only datagrams (they decode to zero rows; shipping them to
    * executors would move bytes for nothing).
    */
  def decodeCounters(packet: Array[Byte]): (Array[Byte], CounterRecords, Boolean) = {
    val bb = ByteBuffer.wrap(packet)
    if (packet.length < 28 || bb.getInt != 5)
      return (Array.empty, CounterRecords(), false)
    val agentType = bb.getInt
    val agentLen = if (agentType == 2) 16 else 4
    val agent = (0 until agentLen).map(i => bb.get(8 + i)).toArray
    bb.position(8 + agentLen)
    bb.getInt; bb.getInt; bb.getInt // subAgent, sequence, uptime
    val numSamples = bb.getInt
    val ifc = ArrayBuffer.empty[IfCounters]
    val eth = ArrayBuffer.empty[(Long, EthernetCounters)]
    val vlan = ArrayBuffer.empty[VlanCounters]
    val proc = ArrayBuffer.empty[ProcessorCounters]
    def result() =
      (agent, CounterRecords(ifc.toSeq, eth.toSeq, vlan.toSeq, proc.toSeq))
    var hasFlow = false
    var s = 0
    while (s < numSamples && bb.remaining() >= 8) {
      val sampleType = bb.getInt & 0xffffffffL
      val sampleLen = bb.getInt
      val sampleEnd = bb.position() + sampleLen
      if (sampleLen < 0 || sampleEnd > packet.length) {
        val (a, c) = result(); return (a, c, hasFlow)
      }
      val format = (sampleType & 0xfff).toInt
      val enterprise = (sampleType >> 12).toInt
      if (enterprise == 0 && (format == 1 || format == 3)) hasFlow = true
      if (enterprise == 0 && (format == 2 || format == 4)) {
        bb.getInt // sample sequence
        // source index attributes ifIndex-less records (ethernet): compact
        // sourceId packs type<<24|index, the expanded form carries them split
        val sourceIdx =
          if (format == 2) (bb.getInt & 0xffffffL).toLong
          else { bb.getInt; bb.getInt & 0xffffffffL }
        val numRecords = bb.getInt
        var r = 0
        while (r < numRecords && bb.position() + 8 <= sampleEnd) {
          val recType = bb.getInt & 0xffffffffL
          val recLen = bb.getInt
          val recEnd = bb.position() + recLen
          if (recLen < 0 || recEnd > sampleEnd) {
            val (a, c) = result(); return (a, c, hasFlow)
          }
          val p = bb.position()
          def u32(off: Int): Long = bb.getInt(p + off) & 0xffffffffL
          def u64(off: Int): Long = bb.getLong(p + off)
          if ((recType >> 12) == 0) (recType & 0xfff).toInt match {
            case 1 if recLen >= 88 =>
              // struct if_counters (sFlow v5 §5): ifIndex u32@0, ifType u32@4,
              // ifSpeed u64@8, ifDirection u32@16, ifStatus u32@20,
              // ifInOctets u64@24, ifInUcastPkts u32@32, ifInErrors u32@48,
              // ifOutOctets u64@56, ifOutUcastPkts u32@64, ifOutErrors u32@80
              ifc += IfCounters(
                ifIndex = u32(0), ifSpeed = u64(8),
                ifInOctets = u64(24), ifInUcastPkts = u32(32), ifInErrors = u32(48),
                ifOutOctets = u64(56), ifOutUcastPkts = u32(64), ifOutErrors = u32(80))
            case 2 if recLen >= 52 =>
              // struct ethernet_counters: 13 consecutive dot3Stats u32s
              eth += ((sourceIdx, EthernetCounters(
                alignmentErrors = u32(0), fcsErrors = u32(4),
                singleCollisionFrames = u32(8), multipleCollisionFrames = u32(12),
                sqeTestErrors = u32(16), deferredTransmissions = u32(20),
                lateCollisions = u32(24), excessiveCollisions = u32(28),
                internalMacTransmitErrors = u32(32), carrierSenseErrors = u32(36),
                frameTooLongs = u32(40), internalMacReceiveErrors = u32(44),
                symbolErrors = u32(48))))
            case 5 if recLen >= 28 =>
              // struct vlan_counters: vlan_id u32, octets u64, ucast/multicast/
              // broadcast pkts u32×3, discards u32
              vlan += VlanCounters(vlanId = u32(0), octets = u64(4),
                ucastPkts = u32(12), multicastPkts = u32(16),
                broadcastPkts = u32(20), discards = u32(24))
            case 1001 if recLen >= 28 =>
              // struct processor: 5s/1m/5m cpu percentages u32×3,
              // total/free memory u64×2
              proc += ProcessorCounters(cpu5s = u32(0), cpu1m = u32(4),
                cpu5m = u32(8), totalMemory = u64(12), freeMemory = u64(20))
            case _ => // unknown record: skip by declared length
          }
          bb.position(recEnd)
          r += 1
        }
      }
      bb.position(sampleEnd)
      s += 1
    }
    val (a, c) = result()
    (a, c, hasFlow)
  }

  // ---- exporter-side encoders (tests + load generation) ----

  /** Encode one counter-sample datagram from pre-built (format, body)
    * records — the mixed-record shape a real agent emits (if-counters +
    * ethernet + vlan + processor in one sample).
    */
  def encodeCounterRecords(agent: Array[Byte], sequence: Long,
      records: Seq[(Int, Array[Byte])], sourceId: Long = 5L): Array[Byte] = {
    val sampleBody = 12 + records.map(8 + _._2.length).sum
    val bb = ByteBuffer.allocate(28 + 8 + sampleBody)
    bb.putInt(5); bb.putInt(1); bb.put(agent)
    bb.putInt(0) // subAgentId
    bb.putInt(sequence.toInt)
    bb.putInt(123456) // uptime
    bb.putInt(1) // one sample
    bb.putInt(2) // counter sample format
    bb.putInt(sampleBody)
    bb.putInt(1) // sample sequence
    bb.putInt(sourceId.toInt)
    bb.putInt(records.size)
    records.foreach { case (fmt, body) =>
      bb.putInt(fmt); bb.putInt(body.length); bb.put(body)
    }
    bb.array()
  }

  /** struct if_counters record (format 1, 88 bytes). */
  def ifRecord(c: IfCounters): (Int, Array[Byte]) = {
    val bb = ByteBuffer.allocate(88)
    bb.putInt(c.ifIndex.toInt).putInt(6 /*ifType ethernetCsmacd*/)
    bb.putLong(c.ifSpeed)
    bb.putInt(1 /*ifDirection full-duplex*/).putInt(3 /*ifStatus admin+oper up*/)
    bb.putLong(c.ifInOctets).putInt(c.ifInUcastPkts.toInt)
    bb.putInt(0).putInt(0).putInt(0) // multicast, broadcast, discards
    bb.putInt(c.ifInErrors.toInt).putInt(0) // unknown protos
    bb.putLong(c.ifOutOctets).putInt(c.ifOutUcastPkts.toInt)
    bb.putInt(0).putInt(0).putInt(0) // multicast, broadcast, discards
    bb.putInt(c.ifOutErrors.toInt).putInt(0) // promiscuous
    (1, bb.array())
  }

  /** struct ethernet_counters record (format 2, 52 bytes). */
  def ethernetRecord(c: EthernetCounters): (Int, Array[Byte]) = {
    val bb = ByteBuffer.allocate(52)
    Seq(c.alignmentErrors, c.fcsErrors, c.singleCollisionFrames,
      c.multipleCollisionFrames, c.sqeTestErrors, c.deferredTransmissions,
      c.lateCollisions, c.excessiveCollisions, c.internalMacTransmitErrors,
      c.carrierSenseErrors, c.frameTooLongs, c.internalMacReceiveErrors,
      c.symbolErrors).foreach(v => bb.putInt(v.toInt))
    (2, bb.array())
  }

  /** struct vlan_counters record (format 5, 28 bytes). */
  def vlanRecord(c: VlanCounters): (Int, Array[Byte]) = {
    val bb = ByteBuffer.allocate(28)
    bb.putInt(c.vlanId.toInt).putLong(c.octets).putInt(c.ucastPkts.toInt)
      .putInt(c.multicastPkts.toInt).putInt(c.broadcastPkts.toInt)
      .putInt(c.discards.toInt)
    (5, bb.array())
  }

  /** struct processor record (format 1001, 28 bytes). */
  def processorRecord(c: ProcessorCounters): (Int, Array[Byte]) = {
    val bb = ByteBuffer.allocate(28)
    bb.putInt(c.cpu5s.toInt).putInt(c.cpu1m.toInt).putInt(c.cpu5m.toInt)
      .putLong(c.totalMemory).putLong(c.freeMemory)
    (1001, bb.array())
  }

  /** Encode an sFlow v5 datagram carrying one counter sample with the
    * given generic-if-counters records (test/exporter side).
    */
  def encodeCounters(agent: Array[Byte], sequence: Long,
      counters: Seq[IfCounters]): Array[Byte] =
    encodeCounterRecords(agent, sequence, counters.map(ifRecord))

  /** Build an Ethernet+IPv4+TCP/UDP/ICMP header blob for a test sample. */
  def ipv4Frame(src: Array[Byte], dst: Array[Byte], proto: Int,
      srcPort: Int, dstPort: Int, tcpFlags: Int = 0, vlan: Boolean = false,
      ipId: Int = 0, vlanId: Int = 42,
      mpls: Option[(Long, Int)] = None): Array[Byte] = {
    val buf = ArrayBuffer.empty[Byte]
    buf ++= Array.fill[Byte](12)(0x02) // MACs
    if (vlan) {
      buf ++= Array[Byte](0x81.toByte, 0,
        ((vlanId >> 8) & 0xf).toByte, (vlanId & 0xff).toByte)
    }
    mpls match {
      case Some((label, ttl)) => // single bottom-of-stack shim
        buf ++= Array[Byte](0x88.toByte, 0x47,
          ((label >> 12) & 0xff).toByte, ((label >> 4) & 0xff).toByte,
          ((((label & 0xf) << 4) | 1).toByte), (ttl & 0xff).toByte)
      case None =>
        buf ++= Array[Byte](8, 0) // ethertype IPv4
    }
    val ip = new Array[Byte](20)
    ip(0) = 0x45 // v4, ihl 5
    ip(4) = ((ipId >> 8) & 0xff).toByte; ip(5) = (ipId & 0xff).toByte
    ip(8) = 64 // ttl
    ip(9) = proto.toByte
    System.arraycopy(src, 0, ip, 12, 4)
    System.arraycopy(dst, 0, ip, 16, 4)
    buf ++= ip
    proto match {
      case 6 =>
        val tcp = new Array[Byte](20)
        tcp(0) = ((srcPort >> 8) & 0xff).toByte; tcp(1) = (srcPort & 0xff).toByte
        tcp(2) = ((dstPort >> 8) & 0xff).toByte; tcp(3) = (dstPort & 0xff).toByte
        tcp(12) = 0x50; tcp(13) = tcpFlags.toByte
        buf ++= tcp
      case 17 =>
        val udp = new Array[Byte](8)
        udp(0) = ((srcPort >> 8) & 0xff).toByte; udp(1) = (srcPort & 0xff).toByte
        udp(2) = ((dstPort >> 8) & 0xff).toByte; udp(3) = (dstPort & 0xff).toByte
        buf ++= udp
      case 1 =>
        buf ++= Array[Byte](srcPort.toByte, dstPort.toByte, 0, 0) // type, code
      case _ =>
    }
    buf.toArray
  }

  /** Encode one sFlow v5 datagram of flow samples; each sample is
    * (samplingRate, frameLength, headerBytes).
    */
  def encode(agent: Array[Byte], sequence: Long,
      samples: Seq[(Long, Long, Array[Byte])], expanded: Boolean = false,
      subAgentId: Long = 0L,
      // plain-layout interface WORDS (2-bit format | 30-bit value) so tests
      // can exercise the non-ifIndex formats; defaults = ifIndex 1 / 2
      inputWord: Int = 1, outputWord: Int = 2,
      // optional extended-router record (format 1002) appended to every
      // sample: (next-hop address bytes [4 or 16], src_mask, dst_mask)
      extRouter: Option[(Array[Byte], Int, Int)] = None,
      // optional extended-gateway record (format 1003): (next-hop bytes,
      // router AS, src_as, src_peer_as, dst AS path as one SEQUENCE)
      extGateway: Option[(Array[Byte], Long, Long, Long, Seq[Long])] = None): Array[Byte] = {
    def pad4(n: Int): Int = (4 - n % 4) % 4
    val extBody = extRouter.map { case (nh, _, _) => 4 + nh.length + 8 }
    val gwBody = extGateway.map { case (nh, _, _, _, path) =>
      4 + nh.length + 12 + 4 + (if (path.nonEmpty) 8 + 4 * path.size else 0) }
    val bodies = samples.map { case (rate, frameLen, header) =>
      val recBody = 16 + header.length + pad4(header.length)
      val sampleBody = (if (expanded) 44 else 32) + 8 + recBody +
        extBody.map(8 + _).getOrElse(0) + gwBody.map(8 + _).getOrElse(0)
      val bb = ByteBuffer.allocate(8 + sampleBody)
      bb.putInt(if (expanded) 3 else 1) // flow sample (expanded) format
      bb.putInt(sampleBody)
      bb.putInt(1) // sample sequence
      if (expanded) { bb.putInt(0); bb.putInt(5) } else bb.putInt(5) // sourceId
      bb.putInt(rate.toInt)
      bb.putInt(1000) // pool
      bb.putInt(0) // drops
      if (expanded) { bb.putInt(0); bb.putInt(1); bb.putInt(0); bb.putInt(2) }
      else { bb.putInt(inputWord); bb.putInt(outputWord) } // input, output
      bb.putInt(1 + extRouter.size + extGateway.size) // numRecords
      bb.putInt(1) // raw packet header record
      bb.putInt(recBody)
      bb.putInt(1) // headerProtocol ethernet
      bb.putInt(frameLen.toInt)
      bb.putInt(4) // stripped
      bb.putInt(header.length)
      bb.put(header)
      bb.put(new Array[Byte](pad4(header.length)))
      extRouter.foreach { case (nh, sm, dm) =>
        bb.putInt(1002) // extended router data
        bb.putInt(extBody.get)
        bb.putInt(if (nh.length == 4) 1 else 2) // address type
        bb.put(nh)
        bb.putInt(sm)
        bb.putInt(dm)
      }
      extGateway.foreach { case (nh, routerAs, srcAs, srcPeerAs, path) =>
        bb.putInt(1003) // extended gateway data
        bb.putInt(gwBody.get)
        bb.putInt(if (nh.length == 4) 1 else 2)
        bb.put(nh)
        bb.putInt(routerAs.toInt)
        bb.putInt(srcAs.toInt)
        bb.putInt(srcPeerAs.toInt)
        if (path.isEmpty) bb.putInt(0)
        else {
          bb.putInt(1) // one path segment
          bb.putInt(2) // AS_SEQUENCE
          bb.putInt(path.size)
          path.foreach(as => bb.putInt(as.toInt))
        }
      }
      bb.array()
    }
    val bb = ByteBuffer.allocate(28 + bodies.map(_.length).sum)
    bb.putInt(5) // sFlow version
    bb.putInt(1) // agent address type IPv4
    bb.put(agent)
    bb.putInt(subAgentId.toInt)
    bb.putInt(sequence.toInt)
    bb.putInt(123456) // uptime
    bb.putInt(samples.size)
    bodies.foreach(bb.put)
    bb.array()
  }
}
