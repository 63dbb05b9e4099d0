package graft.sources

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

/** NetFlow v9 (RFC 3954) + IPFIX (RFC 7011) wire codec — the decoder behind
  * the reference's `netflow://` UDP listener (`main.go:232-236`, goflow's
  * StateNetFlow handles both versions on one port). Both formats are
  * TEMPLATE-based: template sets (FlowSet id 0 / 2) declare
  * (field id, length) layouts keyed by template id, and data sets
  * (id ≥ 256) decode against a previously-learned template — so unlike v5
  * the decode is stateful across packets. [[UdpFlowStream]] learns
  * templates on the receiver thread (they are tiny and rare) and ships an
  * immutable snapshot to executors with each micro-batch; data sets whose
  * template has not arrived yet are dropped and counted, exactly like a
  * real collector.
  *
  * Wire layout (all big-endian):
  *
  * v9 header (20B): version=9(u16) count(u16) sys_uptime_ms(u32)
  *   unix_secs(u32) sequence(u32) source_id(u32)
  * IPFIX header (16B): version=10(u16) length(u16) export_secs(u32)
  *   sequence(u32) observation_domain(u32)
  * set: set_id(u16) length(u16, bytes incl header); padded to 4B
  *   template set (v9 id=0, IPFIX id=2): [tid(u16≥256) nfields(u16)
  *     (field_id(u16) field_len(u16))*]; IPFIX enterprise-bit fields carry
  *     a 4-byte enterprise number (skipped here)
  *   data set (id ≥ 256): fixed-size records per the template, padded
  *
  * Field semantics follow goflow's FlowMessage mapping (`main.go:45-77`
  * column parity): v9 FIRST/LAST_SWITCHED (IE 21/22) are sys-uptime-
  * relative milliseconds reconstructed against the export clock like v5;
  * IPFIX carries absolute flowStart/EndMilliseconds (IE 152/153) or
  * seconds (IE 150/151); ICMP v9/IPFIX convention packs type*256+code
  * into icmpTypeCodeIPv4 (IE 32), unpacked into icmp_type/icmp_code;
  * IPv6 address IEs (27/28) flip etype to 0x86DD. Unknown IEs are skipped
  * by length — a template with vendor fields still decodes the columns the
  * flows schema carries.
  */
object NetFlowV9 {

  /** `isOptions`: an options template (v9 set 1 / IPFIX set 3) — its data
    * records carry exporter metadata (sampling rate, IE 34/305), not flows.
    *
    * A declared field length of 65535 marks an IPFIX variable-length IE
    * (RFC 7011 §7): each record carries the actual length inline (1 byte,
    * or 0xFF + u16), so records are self-describing and non-fixed-size.
    * `minRecordBytes` is the smallest possible record (fixed fields + 1
    * length-prefix byte per varlen field) — the record-loop admission
    * bound; any trailing bytes smaller than it are set padding.
    */
  final case class Template(id: Int, fields: Seq[(Int, Int)],
      isOptions: Boolean = false) {
    val recordBytes: Int = fields.map(_._2).sum
    val hasVarlen: Boolean = fields.exists(_._2 == 65535)
    val minRecordBytes: Int =
      fields.map(f => if (f._2 == 65535) 1 else f._2).sum
  }

  /** Templates learned from one datagram: (sourceId/obsDomain, templateId)
    * → layout. Runs on the receiver thread — templates only, cheap.
    */
  def decodeTemplates(packet: Array[Byte]): Seq[(Long, Template)] = {
    val bb = ByteBuffer.wrap(packet)
    val version = bb.getShort & 0xffff
    val out = ArrayBuffer.empty[(Long, Template)]
    if (version != 9 && version != 10) return out.toSeq
    val headerLen = if (version == 9) 20 else 16
    if (packet.length < headerLen) return out.toSeq
    val sourceId =
      if (version == 9) { bb.position(16); bb.getInt & 0xffffffffL }
      else { bb.position(12); bb.getInt & 0xffffffffL }
    val templateSetId = if (version == 9) 0 else 2
    val optionsSetId = if (version == 9) 1 else 3
    var pos = headerLen
    while (pos + 4 <= packet.length) {
      bb.position(pos)
      val setId = bb.getShort & 0xffff
      val setLen = bb.getShort & 0xffff
      if (setLen < 4 || pos + setLen > packet.length) return out.toSeq // malformed tail
      val end = pos + setLen
      if (setId == templateSetId) {
        var scanning = true
        while (scanning && bb.position() + 4 <= end) {
          val tid = bb.getShort & 0xffff
          val nf = bb.getShort & 0xffff
          if (tid >= 256 && nf > 0) {
            // IPFIX enterprise-bit field specs are 8 bytes (the spec plus a
            // 4-byte enterprise number), not 4 — so the boundary must be
            // checked per field as bytes are consumed, not as 4*nf up
            // front: an enterprise-heavy template would otherwise read
            // specs from the NEXT set and silently learn a wrong layout
            val fields = ArrayBuffer.empty[(Int, Int)]
            var overrun = false
            while (!overrun && fields.size < nf) {
              if (bb.position() + 4 > end) overrun = true
              else {
                val fid = bb.getShort & 0xffff
                val flen = bb.getShort & 0xffff
                if (version == 10 && (fid & 0x8000) != 0) {
                  if (bb.position() + 4 > end) overrun = true
                  else bb.getInt // enterprise no. (skipped)
                }
                // enterprise-bit fields keep the bit set: a vendor-private
                // element (RFC 7011 §3.2) is NOT the same-numbered IANA IE —
                // stripping the bit would decode vendor bytes as standard
                // flow columns. With the bit kept, decodeRecord's IE match
                // never fires and the field is skipped by length.
                if (!overrun) fields += ((fid, flen))
              }
            }
            if (overrun) {
              // malformed template record: discard it, count it, and stop
              // scanning this set (the cursor is past trustworthy bytes)
              UdpFlowSource.dropped.increment()
              scanning = false
            } else {
              // IPFIX variable-length fields (len 65535) are legal and
              // learned (RFC 7011 §7 — decode reads the per-record length
              // prefix); v9 has no varlen encoding (RFC 3954), so a v9
              // template declaring 65535 is malformed and NOT stored — its
              // data sets are then refused at admission (templateMisses),
              // a visible state instead of a silent zero-record decode
              if (version == 10 || fields.forall(_._2 != 65535))
                out += ((sourceId, Template(tid, fields.toSeq)))
            }
          } else bb.position(end) // padding: stop scanning this set
        }
      } else if (setId == optionsSetId && version == 9 && pos + 10 <= end) {
        // v9 options template: tid, scopeLen(bytes), optionLen(bytes),
        // then scope pairs and option pairs
        val tid = bb.getShort & 0xffff
        val scopeLen = bb.getShort & 0xffff
        val optionLen = bb.getShort & 0xffff
        val nPairs = (scopeLen + optionLen) / 4
        if (tid >= 256 && bb.position() + 4 * nPairs <= end) {
          val fields = (0 until nPairs).map { i =>
            val fid = bb.getShort & 0xffff
            val flen = bb.getShort & 0xffff
            // scope fields use a separate type space (1=System…); negate
            // so they can never collide with flow IEs in the decoder
            (if (i < scopeLen / 4) -fid else fid, flen)
          }
          out += ((sourceId, Template(tid, fields, isOptions = true)))
        }
      } else if (setId == optionsSetId && version == 10 && pos + 10 <= end) {
        // IPFIX options template: tid, fieldCount, scopeFieldCount; scope
        // fields lead
        val tid = bb.getShort & 0xffff
        val nf = bb.getShort & 0xffff
        val nScope = bb.getShort & 0xffff
        if (tid >= 256 && nf >= nScope) {
          val fields = (0 until nf).flatMap { i =>
            if (bb.position() + 4 > end) None
            else {
              val fid = bb.getShort & 0xffff
              val flen = bb.getShort & 0xffff
              // the enterprise number is 4 MORE bytes — bounds-check it too
              if ((fid & 0x8000) != 0 && bb.position() + 4 > end) None
              else {
                if ((fid & 0x8000) != 0) bb.getInt // enterprise no.
                // enterprise bit kept (vendor element ≠ IANA IE — see the
                // flow-template path); scope fields negate as before
                Some((if (i < nScope) -(fid & 0x7fff) else fid, flen))
              }
            }
          }
          if (fields.size == nf)
            out += ((sourceId, Template(tid, fields, isOptions = true)))
        }
      }
      pos += setLen
    }
    out.toSeq
  }

  /** Sampling-rate announcements carried in options DATA records
    * (IE 34 samplingInterval / IE 305 samplingPacketInterval — how real
    * v9/IPFIX exporters communicate the rate; goflow keeps the same
    * per-source state). Returns (sourceId, rate) per announcement; runs on
    * the receiver thread next to template learning.
    */
  def samplingFromOptions(packet: Array[Byte],
      templates: Map[(Long, Int), Template]): Seq[(Long, Long)] = {
    val bb = ByteBuffer.wrap(packet)
    val version = bb.getShort & 0xffff
    if (version != 9 && version != 10) return Nil
    val headerLen = if (version == 9) 20 else 16
    if (packet.length < headerLen) return Nil
    bb.position(if (version == 9) 16 else 12)
    val sourceId = bb.getInt & 0xffffffffL
    val out = ArrayBuffer.empty[(Long, Long)]
    var pos = headerLen
    while (pos + 4 <= packet.length) {
      bb.position(pos)
      val setId = bb.getShort & 0xffff
      val setLen = bb.getShort & 0xffff
      if (setLen < 4 || pos + setLen > packet.length) return out.toSeq
      if (setId >= 256) {
        templates.get((sourceId, setId)).filter(_.isOptions).foreach { t =>
          val end = pos + setLen
          bb.position(pos + 4)
          while (t.recordBytes > 0 && bb.position() + t.recordBytes <= end) {
            var rate = -1L
            t.fields.foreach { case (fid, flen) =>
              val p = bb.position()
              if (fid == 34 || fid == 305) {
                // Big-endian: keep the LAST 8 bytes of an oversized field —
                // same rule as the data-record uint() below; the two paths
                // decode the same wire type and must agree (VERDICT r08).
                var v = 0L
                var i = if (flen > 8) flen - 8 else 0
                while (i < flen) { v = (v << 8) | (bb.get(p + i) & 0xffL); i += 1 }
                rate = v
              }
              bb.position(p + flen)
            }
            if (rate >= 0) out += ((sourceId, rate))
          }
        }
      }
      pos += setLen
    }
    out.toSeq
  }

  /** Header sniff for the receiver: (sourceId, ids of the DATA sets in the
    * datagram). Used to drop untemplated data packets at admission — a
    * collector can do nothing with a data set whose template hasn't
    * arrived, and exporters re-send templates periodically (RFC 3954 §5),
    * so dropping now and admitting the re-send converges.
    */
  def dataSetIds(packet: Array[Byte]): (Long, Seq[Int]) = {
    val bb = ByteBuffer.wrap(packet)
    val version = bb.getShort & 0xffff
    if (version != 9 && version != 10) return (0L, Nil)
    val headerLen = if (version == 9) 20 else 16
    if (packet.length < headerLen) return (0L, Nil)
    bb.position(if (version == 9) 16 else 12)
    val sourceId = bb.getInt & 0xffffffffL
    val ids = ArrayBuffer.empty[Int]
    var pos = headerLen
    while (pos + 4 <= packet.length) {
      bb.position(pos)
      val setId = bb.getShort & 0xffff
      val setLen = bb.getShort & 0xffff
      if (setLen < 4 || pos + setLen > packet.length) return (sourceId, ids.toSeq)
      if (setId >= 256) ids += setId
      pos += setLen
    }
    (sourceId, ids.toSeq)
  }

  /** Decode the DATA sets of one v9/IPFIX datagram against the template
    * snapshot. Returns (flows, dataRecordsDroppedForMissingTemplate).
    * `samplingDefaults` (sourceId → rate learned from options data) fills
    * `sampling_rate` for records whose template carries no IE 34, the way
    * goflow applies exporter-announced rates.
    */
  def decode(packet: Array[Byte], sampler: Array[Byte],
      templates: Map[(Long, Int), Template],
      samplingDefaults: Map[Long, Long] = Map.empty): (Seq[NetFlowV5.RawFlow], Int) = {
    val bb = ByteBuffer.wrap(packet)
    require(packet.length >= 2, s"short packet: ${packet.length}")
    val version = bb.getShort & 0xffff
    require(version == 9 || version == 10, s"not NetFlow v9/IPFIX: version=$version")
    val headerLen = if (version == 9) 20 else 16
    // the v9 header is 20 bytes — requiring only 16 would let the sourceId
    // read underflow (an unchecked exception the caller does not treat as
    // a malformed-packet signal)
    require(packet.length >= headerLen,
      s"short v$version packet: ${packet.length} < $headerLen")

    var sysUptime = 0L
    var exportSecs = 0L
    var sequence = 0L
    var sourceId = 0L
    if (version == 9) {
      bb.getShort // count
      sysUptime = bb.getInt & 0xffffffffL
      exportSecs = bb.getInt & 0xffffffffL
      sequence = bb.getInt & 0xffffffffL
      sourceId = bb.getInt & 0xffffffffL
    } else {
      bb.getShort // total length
      exportSecs = bb.getInt & 0xffffffffL
      sequence = bb.getInt & 0xffffffffL
      sourceId = bb.getInt & 0xffffffffL
    }
    val exportMs = exportSecs * 1000L

    val flows = ArrayBuffer.empty[NetFlowV5.RawFlow]
    var dropped = 0
    var pos = headerLen
    while (pos + 4 <= packet.length) {
      bb.position(pos)
      val setId = bb.getShort & 0xffff
      val setLen = bb.getShort & 0xffff
      require(setLen >= 4 && pos + setLen <= packet.length,
        s"malformed set at $pos: id=$setId len=$setLen")
      if (setId >= 256) {
        templates.get((sourceId, setId)) match {
          case Some(t) if t.isOptions => // exporter metadata, not flows
          case Some(t) if t.minRecordBytes > 0 =>
            val end = pos + setLen
            // varlen records are self-sizing: the loop admits on the
            // MINIMUM record size (rest is padding, RFC 7011 §3.3.1) and
            // decodeRecord returns null on a length prefix that overruns
            // the set — a malformed record poisons the rest of the set
            // (the cursor is no longer trustworthy), so stop and count
            var cont = true
            while (cont && bb.position() + t.minRecordBytes <= end) {
              val f = decodeRecord(bb, t, end, version, sampler, sysUptime,
                exportMs, exportSecs, sequence,
                samplingDefaults.getOrElse(sourceId, 0L))
              if (f == null) { cont = false; dropped += 1 }
              else flows += f
            }
          case _ =>
            dropped += 1 // data set before its template: collector drops
        }
      }
      pos += setLen
    }
    (flows.toSeq, dropped)
  }

  /** Decode one data record at the buffer cursor; advances the cursor past
    * the record. Returns null if a variable-length field's length prefix
    * runs past `end` (malformed record — caller abandons the set). Mapped
    * IEs that arrive varlen-encoded still decode (uint caps at 8 bytes,
    * addresses check the ACTUAL length); unmapped varlen fields skip by
    * their inline length, same as unknown fixed fields skip by declared
    * length.
    */
  private def decodeRecord(bb: ByteBuffer, t: Template, setEnd: Int, version: Int,
      sampler: Array[Byte], sysUptime: Long, exportMs: Long, exportSecs: Long,
      sequence: Long, samplingDefault: Long): NetFlowV5.RawFlow = {
    var bytes = 0L; var packets = 0L; var proto = 0; var tos = 0
    var tcpFlags = 0; var srcPort = 0; var dstPort = 0
    var srcAddr: Array[Byte] = Array[Byte](0, 0, 0, 0)
    var dstAddr: Array[Byte] = Array[Byte](0, 0, 0, 0)
    var etype = 0x800
    var firstUptimeMs = -1L; var lastUptimeMs = -1L
    var startMs = -1L; var endMs = -1L
    var icmpPacked = -1
    var samplingRate = samplingDefault // options-announced; IE 34 overrides
    var direction = 0
    var fragId = 0L; var fragOffset = 0
    var fwdStatus = 0
    // extended surface (emitted only under extended=true)
    var nextHop: Array[Byte] = Array[Byte](0, 0, 0, 0)
    var inIf = 0L; var outIf = 0L
    var srcAs = 0L; var dstAs = 0L
    var vlanId = 0; var mplsLabel = 0L // v9 exports no TTL for the top label
    var srcMask = 0; var dstMask = 0
    var nextHopAs = 0L

    var malformed = false
    val fieldIt = t.fields.iterator
    while (!malformed && fieldIt.hasNext) {
      val (fid, declLen) = fieldIt.next()
      var p = bb.position()
      var flen = declLen
      if (declLen == 65535) {
        // RFC 7011 §7: actual length in 1 byte; 0xFF escapes to a u16
        if (p + 1 > setEnd) malformed = true
        else {
          val l0 = bb.get(p) & 0xff
          if (l0 < 255) { flen = l0; p += 1 }
          else if (p + 3 > setEnd) malformed = true
          else { flen = ((bb.get(p + 1) & 0xff) << 8) | (bb.get(p + 2) & 0xff); p += 3 }
        }
      }
      // a fixed field can also overrun once varlen fields precede it —
      // record sizes are no longer loop-guaranteed, so bound every field
      if (!malformed && p + flen > setEnd) malformed = true
      if (!malformed) {
      def uint(): Long = {
        // Big-endian: the low-order bytes are at the END of the field, so an
        // oversized (9+ byte, zero-padded varlen) integer keeps its LAST 8
        // bytes — keeping the first 8 would discard the value (ADVICE r07).
        var v = 0L
        var i = if (flen > 8) flen - 8 else 0
        while (i < flen) { v = (v << 8) | (bb.get(p + i) & 0xffL); i += 1 }
        v
      }
      fid match {
        case 1 => bytes = uint()
        case 2 => packets = uint()
        case 4 => proto = uint().toInt
        case 5 => tos = uint().toInt
        case 6 => tcpFlags = uint().toInt
        case 7 => srcPort = uint().toInt
        case 8 if flen == 4 =>
          srcAddr = Array(bb.get(p), bb.get(p + 1), bb.get(p + 2), bb.get(p + 3))
        case 9 => srcMask = uint().toInt & 0xff // sourceIPv4PrefixLength
        case 10 => inIf = uint() & 0xffffffffL // ingressInterface (unsigned32)
        case 13 => dstMask = uint().toInt & 0xff // destinationIPv4PrefixLength
        case 11 => dstPort = uint().toInt
        case 12 if flen == 4 =>
          dstAddr = Array(bb.get(p), bb.get(p + 1), bb.get(p + 2), bb.get(p + 3))
        case 14 => outIf = uint() & 0xffffffffL // egressInterface (unsigned32)
        case 15 if flen == 4 => // ipNextHopIPv4Address
          nextHop = Array(bb.get(p), bb.get(p + 1), bb.get(p + 2), bb.get(p + 3))
        case 16 => srcAs = uint() // bgpSourceAsNumber (2 or 4 bytes)
        case 17 => dstAs = uint() // bgpDestinationAsNumber
        case 21 => lastUptimeMs = uint()
        case 22 => firstUptimeMs = uint()
        case 27 if flen == 16 =>
          srcAddr = (0 until 16).map(i => bb.get(p + i)).toArray; etype = 0x86dd
        case 28 if flen == 16 =>
          dstAddr = (0 until 16).map(i => bb.get(p + i)).toArray; etype = 0x86dd
        case 29 => srcMask = uint().toInt & 0xff // sourceIPv6PrefixLength
        case 30 => dstMask = uint().toInt & 0xff // destinationIPv6PrefixLength
        case 32 => icmpPacked = uint().toInt // type*256 + code
        case 34 => samplingRate = uint()
        case 54 => fragId = uint()
        case 61 => direction = uint().toInt
        case 62 if flen == 16 => // ipNextHopIPv6Address
          nextHop = (0 until 16).map(i => bb.get(p + i)).toArray
        case 88 => fragOffset = uint().toInt
        case 128 => nextHopAs = uint() & 0xffffffffL // bgpNextAdjacentAsNumber
        case 89 => fwdStatus = uint().toInt
        case 150 => startMs = uint() * 1000L // flowStartSeconds
        case 151 => endMs = uint() * 1000L
        case 58 => vlanId = uint().toInt & 0xfff // SRC_VLAN / vlanId
        case 70 if flen >= 3 =>
          // MPLS_LABEL_1 / mplsTopLabelStackSection: FIRST 3 bytes are
          // label(20) | exp(3) | bos(1) — read positionally, not via
          // uint(), which keeps the LAST 8 bytes of longer stack sections
          mplsLabel = (((bb.get(p) & 0xffL) << 12) |
            ((bb.get(p + 1) & 0xffL) << 4) | ((bb.get(p + 2) & 0xff) >> 4)) & 0xfffffL
        case 152 => startMs = uint() // flowStartMilliseconds
        case 153 => endMs = uint()
        case _ => // unknown IE: skip by length
      }
      bb.position(p + flen)
      }
    }
    if (malformed) return null

    // v9 uptime-relative reconstruction (v5 arithmetic); absolute IPFIX
    // timestamps win when present
    val start =
      if (startMs >= 0) startMs / 1000L
      else if (firstUptimeMs >= 0) (exportMs - sysUptime + firstUptimeMs) / 1000L
      else exportSecs
    val end =
      if (endMs >= 0) endMs / 1000L
      else if (lastUptimeMs >= 0) (exportMs - sysUptime + lastUptimeMs) / 1000L
      else exportSecs

    val isIcmp = proto == 1 || proto == 58
    val packed = if (icmpPacked >= 0) icmpPacked else if (isIcmp) dstPort else 0

    NetFlowV5.RawFlow(
      `type` = if (version == 9) 3 else 4, // goflow NETFLOW_V9 / IPFIX
      time_received = exportSecs,
      sequence_num = sequence,
      sampling_rate = samplingRate,
      flow_direction = direction,
      sampler_address = sampler,
      time_flow_start = start,
      time_flow_end = end,
      bytes = bytes,
      packets = packets,
      src_addr = srcAddr,
      dst_addr = dstAddr,
      etype = etype,
      proto = proto,
      src_port = srcPort,
      dst_port = dstPort,
      forwarding_status = fwdStatus,
      tcp_flags = tcpFlags,
      icmp_type = if (isIcmp) packed >> 8 else 0,
      icmp_code = if (isIcmp) packed & 0xff else 0,
      fragment_id = fragId,
      fragment_offset = fragOffset,
      next_hop = nextHop,
      in_if = inIf,
      out_if = outIf,
      src_as = srcAs,
      dst_as = dstAs,
      vlan_id = vlanId,
      mpls_1_label = mplsLabel,
      src_mask = srcMask,
      dst_mask = dstMask,
      next_hop_as = nextHopAs)
  }

  // ---- exporter-side encoders (tests + load generation) ----

  /** Encode a v9 or IPFIX template packet for `templateId` with `fields`. */
  def encodeTemplate(version: Int, sourceId: Long, templateId: Int,
      fields: Seq[(Int, Int)], sysUptimeMs: Long = 0L, unixSecs: Long = 0L,
      sequence: Long = 0L): Array[Byte] = {
    require(version == 9 || version == 10)
    val setBody = 4 + 4 * fields.size
    val headerLen = if (version == 9) 20 else 16
    val bb = ByteBuffer.allocate(headerLen + 4 + setBody)
    writeHeader(bb, version, 1, sysUptimeMs, unixSecs, sequence, sourceId,
      headerLen + 4 + setBody)
    bb.putShort(if (version == 9) 0 else 2) // template set id
    bb.putShort((4 + setBody).toShort)
    bb.putShort(templateId.toShort)
    bb.putShort(fields.size.toShort)
    fields.foreach { case (fid, flen) =>
      bb.putShort(fid.toShort); bb.putShort(flen.toShort)
    }
    bb.array()
  }

  /** Encode a v9/IPFIX OPTIONS template packet (v9 set 1 / IPFIX set 3).
    * Scope fields lead; both field lists use plain (ie, len) pairs.
    */
  def encodeOptionsTemplate(version: Int, sourceId: Long, templateId: Int,
      scopeFields: Seq[(Int, Int)], optionFields: Seq[(Int, Int)],
      unixSecs: Long = 0L, sequence: Long = 0L): Array[Byte] = {
    require(version == 9 || version == 10)
    val nPairs = scopeFields.size + optionFields.size
    val body = 6 + 4 * nPairs
    val pad = (4 - (4 + body) % 4) % 4
    val headerLen = if (version == 9) 20 else 16
    val bb = ByteBuffer.allocate(headerLen + 4 + body + pad)
    writeHeader(bb, version, 1, 0L, unixSecs, sequence, sourceId,
      headerLen + 4 + body + pad)
    bb.putShort(if (version == 9) 1 else 3)
    bb.putShort((4 + body + pad).toShort)
    bb.putShort(templateId.toShort)
    if (version == 9) {
      bb.putShort((4 * scopeFields.size).toShort) // scope section bytes
      bb.putShort((4 * optionFields.size).toShort) // option section bytes
    } else {
      bb.putShort(nPairs.toShort) // total field count
      bb.putShort(scopeFields.size.toShort) // of which scope
    }
    (scopeFields ++ optionFields).foreach { case (fid, flen) =>
      bb.putShort(fid.toShort); bb.putShort(flen.toShort)
    }
    bb.array()
  }

  /** Encode a data packet: `records` are field-value byte blobs laid out
    * per the template (caller builds them with [[fieldBytes]]).
    */
  def encodeData(version: Int, sourceId: Long, templateId: Int,
      records: Seq[Array[Byte]], sysUptimeMs: Long = 0L, unixSecs: Long = 0L,
      sequence: Long = 0L): Array[Byte] = {
    require(version == 9 || version == 10)
    val body = records.map(_.length).sum
    val pad = (4 - (4 + body) % 4) % 4
    val headerLen = if (version == 9) 20 else 16
    val bb = ByteBuffer.allocate(headerLen + 4 + body + pad)
    writeHeader(bb, version, records.size, sysUptimeMs, unixSecs, sequence,
      sourceId, headerLen + 4 + body + pad)
    bb.putShort(templateId.toShort)
    bb.putShort((4 + body + pad).toShort)
    records.foreach(bb.put)
    bb.array()
  }

  private def writeHeader(bb: ByteBuffer, version: Int, count: Int,
      sysUptimeMs: Long, unixSecs: Long, sequence: Long, sourceId: Long,
      totalLen: Int): Unit = {
    bb.putShort(version.toShort)
    if (version == 9) {
      bb.putShort(count.toShort)
      bb.putInt(sysUptimeMs.toInt)
      bb.putInt(unixSecs.toInt)
      bb.putInt(sequence.toInt)
      bb.putInt(sourceId.toInt)
    } else {
      bb.putShort(totalLen.toShort)
      bb.putInt(unixSecs.toInt)
      bb.putInt(sequence.toInt)
      bb.putInt(sourceId.toInt)
    }
  }

  /** Big-endian unsigned value as `len` bytes (record-building helper). */
  def fieldBytes(v: Long, len: Int): Array[Byte] =
    (0 until len).map(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte).toArray

  /** RFC 7011 §7 variable-length encoding of `value` for a field declared
    * with length 65535: 1-byte length for < 255 bytes, else 0xFF + u16.
    */
  def varlenBytes(value: Array[Byte]): Array[Byte] = {
    require(value.length <= 0xffff)
    if (value.length < 255) (value.length.toByte) +: value
    else Array[Byte](-1, (value.length >> 8).toByte, value.length.toByte) ++ value
  }
}
