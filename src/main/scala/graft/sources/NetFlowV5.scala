package graft.sources

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** NetFlow v5 wire codec — the binary decoder behind the reference's `nfl`
  * UDP listener (`main.go:237-241`, goflow's NFLegacy state). The format is
  * the public Cisco NetFlow v5 export layout: a fixed 24-byte header
  * followed by `count` fixed 48-byte flow records, all fields big-endian:
  *
  * header:  version(u16)=5, count(u16), sys_uptime_ms(u32), unix_secs(u32),
  *          unix_nsecs(u32), flow_sequence(u32), engine_type(u8),
  *          engine_id(u8), sampling(u16: 2-bit mode + 14-bit interval)
  * record:  srcaddr(4) dstaddr(4) nexthop(4) input(u16) output(u16)
  *          dPkts(u32) dOctets(u32) first(u32 ms) last(u32 ms) srcport(u16)
  *          dstport(u16) pad(u8) tcp_flags(u8) prot(u8) tos(u8) src_as(u16)
  *          dst_as(u16) src_mask(u8) dst_mask(u8) pad(u16)
  *
  * Field mapping onto [[graft.FlowSchema.rawSchema]] follows the goflow
  * FlowMessage conventions the reference inserts into ClickHouse
  * (`main.go:45-77`): `type`=2 (NETFLOW_V5), sequence_num = header
  * flow_sequence, sampling_rate = 14-bit sampling interval, absolute flow
  * times reconstructed from the export timestamp and the uptime-relative
  * first/last (millisecond arithmetic, so sub-second export clocks don't
  * skew), etype fixed to IPv4 (v5 carries only IPv4), and for ICMP
  * (proto 1) the v5 dstport convention `type*256 + code` unpacked into
  * icmp_type/icmp_code. The 32-bit sys_uptime wraps at ~49.7 days — as in
  * every v5 decoder, flows straddling a wrap are mis-dated by one period.
  */
object NetFlowV5 {

  val HeaderBytes = 24
  val RecordBytes = 48

  /** Raw decoded flow, field-for-field [[graft.FlowSchema.rawSchema]];
    * the trailing defaulted fields are the OPT-IN extended surface
    * ([[graft.FlowSchema.rawExtendedSchema]]) — always decoded (the bytes
    * are on the wire anyway), emitted only under `extended=true`.
    */
  final case class RawFlow(
      `type`: Int,
      time_received: Long,
      sequence_num: Long,
      sampling_rate: Long,
      flow_direction: Int,
      sampler_address: Array[Byte],
      time_flow_start: Long,
      time_flow_end: Long,
      bytes: Long,
      packets: Long,
      src_addr: Array[Byte],
      dst_addr: Array[Byte],
      etype: Int,
      proto: Int,
      src_port: Int,
      dst_port: Int,
      forwarding_status: Int,
      tcp_flags: Int,
      icmp_type: Int,
      icmp_code: Int,
      fragment_id: Long,
      fragment_offset: Int,
      next_hop: Array[Byte] = Array[Byte](0, 0, 0, 0),
      in_if: Long = 0L,
      out_if: Long = 0L,
      src_as: Long = 0L,
      dst_as: Long = 0L,
      vlan_id: Int = 0,
      mpls_1_label: Long = 0L,
      mpls_1_ttl: Int = 0,
      src_mask: Int = 0,
      dst_mask: Int = 0,
      next_hop_as: Long = 0L)

  /** Decode one v5 datagram (`sampler` = the UDP sender address bytes,
    * goflow's SamplerAddress). Throws on a malformed packet — the caller
    * (the UDP reader) drops and counts those, like the reference's decoder
    * error path.
    */
  def decode(packet: Array[Byte], sampler: Array[Byte]): Seq[RawFlow] = {
    require(packet.length >= HeaderBytes, s"short packet: ${packet.length} bytes")
    val bb = ByteBuffer.wrap(packet) // network order (big-endian)
    val version = bb.getShort & 0xffff
    require(version == 5, s"not NetFlow v5: version=$version")
    val count = bb.getShort & 0xffff
    val sysUptime = bb.getInt & 0xffffffffL
    val unixSecs = bb.getInt & 0xffffffffL
    val unixNsecs = bb.getInt & 0xffffffffL
    val flowSequence = bb.getInt & 0xffffffffL
    bb.get(); bb.get() // engine_type, engine_id: not in the flows schema
    val sampling = bb.getShort & 0xffff
    val samplingRate = (sampling & 0x3fff).toLong
    require(packet.length >= HeaderBytes + count * RecordBytes,
      s"truncated packet: $count records need ${HeaderBytes + count * RecordBytes} bytes, got ${packet.length}")

    val exportMs = unixSecs * 1000L + unixNsecs / 1000000L
    (0 until count).map { r =>
      bb.position(HeaderBytes + r * RecordBytes)
      val src = new Array[Byte](4); bb.get(src)
      val dst = new Array[Byte](4); bb.get(dst)
      val nextHop = new Array[Byte](4); bb.get(nextHop) // extended surface
      val inIf = bb.getShort & 0xffff
      val outIf = bb.getShort & 0xffff
      val pkts = bb.getInt & 0xffffffffL
      val octets = bb.getInt & 0xffffffffL
      val first = bb.getInt & 0xffffffffL
      val last = bb.getInt & 0xffffffffL
      val srcPort = bb.getShort & 0xffff
      val dstPort = bb.getShort & 0xffff
      bb.get() // pad1
      val tcpFlags = bb.get() & 0xff
      val proto = bb.get() & 0xff
      bb.get() // tos: not in the flows schema
      val srcAs = bb.getShort & 0xffff
      val dstAs = bb.getShort & 0xffff
      val srcMask = bb.get() & 0xff // record offsets 44/45
      val dstMask = bb.get() & 0xff
      RawFlow(
        `type` = 2, // goflow FlowType NETFLOW_V5
        time_received = unixSecs,
        sequence_num = flowSequence,
        sampling_rate = samplingRate,
        flow_direction = 0, // v5 has no direction field
        sampler_address = sampler,
        time_flow_start = (exportMs - sysUptime + first) / 1000L,
        time_flow_end = (exportMs - sysUptime + last) / 1000L,
        bytes = octets,
        packets = pkts,
        src_addr = src,
        dst_addr = dst,
        etype = 0x800, // v5 is IPv4-only
        proto = proto,
        src_port = srcPort,
        dst_port = dstPort,
        forwarding_status = 0,
        tcp_flags = tcpFlags,
        icmp_type = if (proto == 1) dstPort >> 8 else 0,
        icmp_code = if (proto == 1) dstPort & 0xff else 0,
        fragment_id = 0L,
        fragment_offset = 0,
        next_hop = nextHop,
        in_if = inIf,
        out_if = outIf,
        src_as = srcAs,
        dst_as = dstAs,
        src_mask = srcMask,
        dst_mask = dstMask)
    }
  }

  /** RawFlow → InternalRow in rawSchema field order (the DSv2 reader path). */
  def toInternalRow(f: RawFlow): InternalRow = new GenericInternalRow(Array[Any](
    f.`type`, f.time_received, f.sequence_num, f.sampling_rate,
    f.flow_direction, f.sampler_address, f.time_flow_start, f.time_flow_end,
    f.bytes, f.packets, f.src_addr, f.dst_addr, f.etype, f.proto,
    f.src_port, f.dst_port, f.forwarding_status, f.tcp_flags,
    f.icmp_type, f.icmp_code, f.fragment_id, f.fragment_offset))

  /** RawFlow → InternalRow in rawExtendedSchema order (`extended=true`). */
  def toInternalRowExtended(f: RawFlow): InternalRow = new GenericInternalRow(Array[Any](
    f.`type`, f.time_received, f.sequence_num, f.sampling_rate,
    f.flow_direction, f.sampler_address, f.time_flow_start, f.time_flow_end,
    f.bytes, f.packets, f.src_addr, f.dst_addr, f.etype, f.proto,
    f.src_port, f.dst_port, f.forwarding_status, f.tcp_flags,
    f.icmp_type, f.icmp_code, f.fragment_id, f.fragment_offset,
    f.next_hop, f.in_if, f.out_if, f.src_as, f.dst_as,
    f.vlan_id, f.mpls_1_label, f.mpls_1_ttl, f.src_mask, f.dst_mask,
    f.next_hop_as))

  /** Exporter-side encoder (tests + load generation): builds the v5
    * datagram that [[decode]] reads back. `records` are (src, dst, pkts,
    * octets, firstMs, lastMs, srcPort, dstPort, tcpFlags, proto) tuples.
    */
  final case class Rec(src: Array[Byte], dst: Array[Byte], pkts: Long,
      octets: Long, firstMs: Long, lastMs: Long, srcPort: Int, dstPort: Int,
      tcpFlags: Int, proto: Int, nextHop: Array[Byte] = Array[Byte](0, 0, 0, 0),
      inIf: Int = 0, outIf: Int = 0, srcAs: Int = 0, dstAs: Int = 0,
      srcMask: Int = 0, dstMask: Int = 0)

  def encode(sysUptimeMs: Long, unixSecs: Long, unixNsecs: Long,
      flowSequence: Long, samplingInterval: Int, records: Seq[Rec],
      engineType: Int = 0, engineId: Int = 0): Array[Byte] = {
    require(records.size <= 30, "v5 packets carry at most 30 records")
    val bb = ByteBuffer.allocate(HeaderBytes + records.size * RecordBytes)
    bb.putShort(5)
    bb.putShort(records.size.toShort)
    bb.putInt(sysUptimeMs.toInt)
    bb.putInt(unixSecs.toInt)
    bb.putInt(unixNsecs.toInt)
    bb.putInt(flowSequence.toInt)
    bb.put(engineType.toByte)
    bb.put(engineId.toByte)
    bb.putShort((samplingInterval & 0x3fff).toShort)
    records.foreach { r =>
      bb.put(r.src); bb.put(r.dst); bb.put(r.nextHop)
      bb.putShort(r.inIf.toShort); bb.putShort(r.outIf.toShort)
      bb.putInt(r.pkts.toInt); bb.putInt(r.octets.toInt)
      bb.putInt(r.firstMs.toInt); bb.putInt(r.lastMs.toInt)
      bb.putShort(r.srcPort.toShort); bb.putShort(r.dstPort.toShort)
      bb.put(0.toByte); bb.put(r.tcpFlags.toByte); bb.put(r.proto.toByte)
      bb.put(0.toByte) // tos
      bb.putShort(r.srcAs.toShort); bb.putShort(r.dstAs.toShort)
      bb.put(r.srcMask.toByte); bb.put(r.dstMask.toByte); bb.putShort(0) // masks + pad
    }
    bb.array()
  }
}
