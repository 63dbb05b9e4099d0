package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.sources.{NetFlowV5 => V5, NetFlowV9 => V9, SFlowV5 => SF}

/** Property round-trips for the three wire codecs: arbitrary valid records
  * must survive encode → decode byte-exactly. The fixed-vector specs pin
  * the fiddly semantics (ICMP packing, uptime reconstruction); these pin
  * the LAYOUT — field offsets, unsigned widths, padding — across the whole
  * value space, where a single wrong offset corrupts silently.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val sampler = Array[Byte](127, 0, 0, 1)
  private val ip4Gen: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](4, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  private val u16Gen = Gen.chooseNum(0, 0xffff)
  private val u32Gen = Gen.chooseNum(0L, 0xffffffffL)

  test("property: v5 records round-trip encode -> decode") {
    val recGen = for {
      src <- ip4Gen; dst <- ip4Gen
      pkts <- u32Gen; octets <- u32Gen
      first <- u32Gen; last <- u32Gen
      sp <- u16Gen; dp <- u16Gen
      flags <- Gen.chooseNum(0, 255); proto <- Gen.chooseNum(0, 255)
      nh <- ip4Gen; inIf <- u16Gen; outIf <- u16Gen
      sas <- u16Gen; das <- u16Gen
    } yield V5.Rec(src, dst, pkts, octets, first, last, sp, dp, flags, proto,
      nh, inIf, outIf, sas, das)
    check(Prop.forAll(Gen.listOfN(3, recGen), u32Gen, u32Gen) { (recs, seq, uptime) =>
      val pkt = V5.encode(uptime, 1700000000L, 0L, seq, 64, recs)
      val flows = V5.decode(pkt, sampler)
      flows.size == recs.size && flows.zip(recs).forall { case (f, r) =>
        f.src_addr.sameElements(r.src) && f.dst_addr.sameElements(r.dst) &&
          f.bytes == r.octets && f.packets == r.pkts &&
          f.src_port == r.srcPort && f.dst_port == r.dstPort &&
          f.proto == r.proto && f.sequence_num == seq &&
          // extended surface: on the wire in every v5 record
          f.next_hop.sameElements(r.nextHop) &&
          f.in_if == r.inIf && f.out_if == r.outIf &&
          f.src_as == r.srcAs && f.dst_as == r.dstAs
      }
    })
  }

  test("property: v9 extended IEs (next-hop, interfaces, AS) decode at their offsets") {
    // IE 15 ipNextHopIPv4, 10/14 in/out ifIndex (mixed widths), 16/17
    // BGP AS (4-byte ASNs exceed u16 — decode must widen, not truncate)
    check(Prop.forAll(ip4Gen, u32Gen, u16Gen, u32Gen, u32Gen) {
      (nh, inIf, outIf, sas, das) =>
        val fields = Seq(15 -> 4, 10 -> 4, 14 -> 2, 16 -> 4, 17 -> 4, 1 -> 4)
        val rec = Array(nh, V9.fieldBytes(inIf, 4), V9.fieldBytes(outIf, 2),
          V9.fieldBytes(sas, 4), V9.fieldBytes(das, 4),
          V9.fieldBytes(100, 4)).flatten.toArray
        val t = V9.Template(301, fields)
        val dpkt = V9.encodeData(9, 0, 301, Seq(rec), unixSecs = 1700000000L)
        val (flows, _) = V9.decode(dpkt, sampler, Map((0L, 301) -> t))
        flows.size == 1 && {
          val f = flows.head
          // full unsigned32 ifIndex survives (no Int wrap — ADVICE r09)
          f.next_hop.sameElements(nh) && f.in_if == inIf &&
            f.out_if == outIf && f.src_as == sas && f.dst_as == das &&
            f.bytes == 100L
        }
    })
  }

  test("property: v9 uint fields of every width decode at the right offsets") {
    // template with one field per width 1/2/4/8 for bytes (IE 1) plus
    // ports — decode must slice exactly the declared lengths
    check(Prop.forAll(u32Gen, u16Gen, u16Gen, Gen.chooseNum(1L, Long.MaxValue)) {
      (by4, sp, dp, by8raw) =>
        val by8 = by8raw & 0x7fffffffffffffffL
        val fields = Seq(7 -> 2, 1 -> 8, 11 -> 2, 2 -> 4)
        val rec = Array(V9.fieldBytes(sp, 2), V9.fieldBytes(by8, 8),
          V9.fieldBytes(dp, 2), V9.fieldBytes(by4, 4)).flatten.toArray
        val t = V9.Template(300, fields)
        val dpkt = V9.encodeData(9, 0, 300, Seq(rec), unixSecs = 1700000000L)
        val (flows, _) = V9.decode(dpkt, sampler, Map((0L, 300) -> t))
        flows.size == 1 && flows.head.src_port == sp &&
          flows.head.dst_port == dp && flows.head.bytes == by8 &&
          flows.head.packets == by4
    })
  }

  test("sFlow plain-layout interface words honor the 2-bit format prefix") {
    // format 1 = "discarded: value=reason", format 2 = "multiple:
    // value=count" — neither is an ifIndex, so the plain path must leave
    // the column 0 exactly like the expanded path does (ADVICE r09)
    val hdr = SF.ipv4Frame(Array[Byte](10, 0, 0, 7), Array[Byte](10, 0, 0, 8),
      6, 1234, 443, tcpFlags = 16, vlan = false)
    val pkt = SF.encode(Array[Byte](10, 0, 0, 2), 1L, Seq((256L, 1500L, hdr)),
      expanded = false,
      inputWord = (2 << 30) | 5,      // multiple: count=5 — NOT ifIndex 5
      outputWord = (1 << 30) | 261)   // discarded: reason — NOT ifIndex 261
    val flows = SF.decode(pkt, sampler, 1700000000L)
    assert(flows.size == 1)
    assert(flows.head.in_if == 0L && flows.head.out_if == 0L)
    // and a genuine format-0 word keeps its 30-bit ifIndex value
    val pkt0 = SF.encode(Array[Byte](10, 0, 0, 2), 1L, Seq((256L, 1500L, hdr)),
      expanded = false, inputWord = 0x3ffffffe, outputWord = 7)
    val f0 = SF.decode(pkt0, sampler, 1700000000L).head
    assert(f0.in_if == 0x3ffffffeL && f0.out_if == 7L)
  }

  test("sFlow 802.1Q and MPLS frames surface vlan_id / top label + TTL") {
    val src = Array[Byte](10, 3, 0, 1); val dst = Array[Byte](10, 3, 0, 2)
    // VLAN-tagged TCP frame: TCI low 12 bits are the id
    val vf = SF.ipv4Frame(src, dst, 6, 1234, 443, tcpFlags = 16,
      vlan = true, vlanId = 2049)
    val v = SF.decode(SF.encode(Array[Byte](10, 0, 0, 3), 1L,
      Seq((256L, 600L, vf))), sampler, 1700000000L).head
    assert(v.vlan_id == 2049 && v.mpls_1_label == 0L && v.mpls_1_ttl == 0)
    assert(v.src_port == 1234 && v.dst_port == 443 && v.etype == 0x800)
    // MPLS unicast frame: label 20 bits + TTL from the top shim, inner
    // protocol inferred from the IP version nibble
    val mf = SF.ipv4Frame(src, dst, 17, 5353, 53, mpls = Some((0xabcdeL, 61)))
    val m = SF.decode(SF.encode(Array[Byte](10, 0, 0, 3), 2L,
      Seq((256L, 600L, mf))), sampler, 1700000000L).head
    assert(m.mpls_1_label == 0xabcdeL && m.mpls_1_ttl == 61 && m.vlan_id == 0)
    assert(m.src_port == 5353 && m.dst_port == 53 && m.etype == 0x800)
  }

  test("property: sFlow MPLS label+TTL round-trip across the whole value space") {
    val src = Array[Byte](10, 4, 0, 1); val dst = Array[Byte](10, 4, 0, 2)
    check(Prop.forAll(Gen.chooseNum(0L, 0xfffffL), Gen.chooseNum(0, 255),
      Gen.oneOf(6, 17)) { (label, ttl, proto) =>
      val hdr = SF.ipv4Frame(src, dst, proto, 80, 443, tcpFlags = 16,
        mpls = Some((label, ttl)))
      val fs = SF.decode(SF.encode(Array[Byte](10, 0, 0, 4), 1L,
        Seq((256L, 500L, hdr))), sampler, 1700000000L)
      fs.size == 1 && fs.head.mpls_1_label == label &&
        fs.head.mpls_1_ttl == ttl && fs.head.src_port == 80
    })
  }

  test("802.1Q-tagged MPLS frames carry BOTH vlan_id and the label") {
    val src = Array[Byte](10, 5, 0, 1); val dst = Array[Byte](10, 5, 0, 2)
    val hdr = SF.ipv4Frame(src, dst, 6, 8080, 443, tcpFlags = 24,
      vlan = true, vlanId = 300, mpls = Some((0x12345L, 17)))
    val fs = SF.decode(SF.encode(Array[Byte](10, 0, 0, 6), 1L,
      Seq((256L, 700L, hdr))), sampler, 1700000000L)
    assert(fs.size == 1)
    val f = fs.head
    assert(f.vlan_id == 300 && f.mpls_1_label == 0x12345L && f.mpls_1_ttl == 17)
    assert(f.src_port == 8080 && f.etype == 0x800)
  }

  test("malformed MPLS frames drop cleanly, never crash or misparse") {
    def frame(tail: Array[Byte]): Array[Byte] =
      Array.fill[Byte](12)(0x02) ++ Array[Byte](0x88.toByte, 0x47) ++ tail
    // truncated shim (2 of 4 bytes)
    val truncated = frame(Array[Byte](0x00, 0x01))
    // shim chain with no bottom-of-stack bit before the header ends
    val noBos = frame(Array[Byte](0, 1, 0x00, 64, 0, 2, 0x00, 64))
    // BOS reached but non-IP payload (version nibble 0)
    val nonIp = frame(Array[Byte](0, 1, 0x01, 64, 0x00, 0x00))
    for (bad <- Seq(truncated, noBos, nonIp)) {
      val fs = SF.decode(SF.encode(Array[Byte](10, 0, 0, 5), 1L,
        Seq((256L, 500L, bad))), sampler, 1700000000L)
      assert(fs.isEmpty, s"malformed MPLS frame produced ${fs.size} flows")
    }
  }

  test("v9 IEs 58/70 decode VLAN id and the top MPLS label") {
    // IE 70 is a 3-byte stack section: label(20) | exp(3) | bos(1) — the
    // label must come from the FIRST 20 bits, not a right-aligned uint
    val label = 0x54321L
    val stackSection = Array[Byte](
      ((label >> 12) & 0xff).toByte, ((label >> 4) & 0xff).toByte,
      ((((label & 0xf) << 4) | 1) & 0xff).toByte)
    val fields = Seq(58 -> 2, 70 -> 3, 1 -> 4)
    val rec = Array(V9.fieldBytes(777, 2), stackSection,
      V9.fieldBytes(100, 4)).flatten.toArray
    val t = V9.Template(330, fields)
    val dpkt = V9.encodeData(9, 0, 330, Seq(rec), unixSecs = 1700000000L)
    val (flows, _) = V9.decode(dpkt, sampler, Map((0L, 330) -> t))
    assert(flows.size == 1)
    val f = flows.head
    assert(f.vlan_id == 777 && f.mpls_1_label == label && f.mpls_1_ttl == 0)
  }

  test("property: sFlow counter records round-trip by struct offset") {
    val cGen = for {
      idx <- u32Gen; speed <- Gen.chooseNum(0L, Long.MaxValue)
      inO <- Gen.chooseNum(0L, Long.MaxValue); inP <- u32Gen; inE <- u32Gen
      outO <- Gen.chooseNum(0L, Long.MaxValue); outP <- u32Gen; outE <- u32Gen
    } yield SF.IfCounters(idx, speed, inO, inP, inE, outO, outP, outE)
    check(Prop.forAll(Gen.listOfN(3, cGen), u32Gen) { (cs, seq) =>
      val pkt = SF.encodeCounters(Array[Byte](10, 0, 0, 1), seq, cs)
      val (agent, got, hasFlow) = SF.decodeCounters(pkt)
      got.ifc == cs && !hasFlow && agent.sameElements(Array[Byte](10, 0, 0, 1))
    })
  }

  test("property: sFlow TCP/UDP frames dissect src/dst/ports/flags") {
    check(Prop.forAll(ip4Gen, ip4Gen, u16Gen, u16Gen,
      Gen.chooseNum(0, 63), Gen.oneOf(6, 17), Gen.oneOf(true, false),
      Gen.oneOf(true, false)) {
      (src, dst, sp, dp, flags, proto, vlan, expanded) =>
        val hdr = SF.ipv4Frame(src, dst, proto, sp, dp,
          tcpFlags = flags, vlan = vlan)
        val pkt = SF.encode(Array[Byte](10, 0, 0, 2), 1L, Seq((256L, 1500L, hdr)),
          expanded = expanded)
        val flows = SF.decode(pkt, sampler, 1700000000L)
        flows.size == 1 && {
          val f = flows.head
          f.src_addr.sameElements(src) && f.dst_addr.sameElements(dst) &&
            f.src_port == sp && f.dst_port == dp && f.proto == proto &&
            f.bytes == 1500L &&
            (proto != 6 || f.tcp_flags == flags) &&
            // sample-header interfaces (encode pins input=1, output=2 in
            // both the plain and the expanded sample layout)
            f.in_if == 1 && f.out_if == 2
        }
    })
  }
}
