package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SFlowV5 => SF}

/** sFlow v5 decode: raw-header dissection across TCP/UDP/ICMP, VLAN tags,
  * IPv6, expanded flow samples, and non-IP frame skipping.
  */
class SFlowV5Spec extends AnyFunSuite {

  private val sampler = Array[Byte](127, 0, 0, 1)
  private val agent = Array[Byte](10, 0, 0, 99)
  private val now = 1700000600L

  test("IPv4 TCP sample dissects addresses, ports and flags") {
    val hdr = SF.ipv4Frame(Array[Byte](10, 1, 2, 3), Array[Byte](10, 9, 9, 9),
      proto = 6, srcPort = 40000, dstPort = 443, tcpFlags = 18, ipId = 777)
    val pkt = SF.encode(agent, sequence = 11L, Seq((4096L, 1518L, hdr)))
    val flows = SF.decode(pkt, sampler, now)
    assert(flows.size == 1)
    val f = flows.head
    assert(f.`type` == 1) // SFLOW_5
    assert(f.time_received == now && f.time_flow_start == now && f.time_flow_end == now)
    assert(f.sequence_num == 11L && f.sampling_rate == 4096L)
    assert(f.bytes == 1518L && f.packets == 1L)
    assert(f.src_addr.sameElements(Array[Byte](10, 1, 2, 3)))
    assert(f.dst_addr.sameElements(Array[Byte](10, 9, 9, 9)))
    assert(f.etype == 0x800 && f.proto == 6)
    assert(f.src_port == 40000 && f.dst_port == 443 && f.tcp_flags == 18)
    assert(f.fragment_id == 777L && f.fragment_offset == 0)
    assert(f.sampler_address.sameElements(sampler))
  }

  test("extended-router record (1002) decorates the sample's flow: next-hop + masks") {
    val hdr = SF.ipv4Frame(Array[Byte](10, 1, 2, 3), Array[Byte](10, 9, 9, 9),
      proto = 6, srcPort = 40000, dstPort = 443, tcpFlags = 18)
    val nh = Array[Byte](10, 99, 0, 7)
    val pkt = SF.encode(agent, sequence = 12L, Seq((1024L, 900L, hdr)),
      extRouter = Some((nh, 28, 20)))
    val flows = SF.decode(pkt, sampler, now)
    assert(flows.size == 1)
    val f = flows.head
    assert(f.next_hop.sameElements(nh), "1002 next-hop must decorate the raw-header flow")
    assert(f.src_mask == 28 && f.dst_mask == 20)
    // and without the record, decoration stays at defaults
    val plain = SF.decode(SF.encode(agent, 13L, Seq((1024L, 900L, hdr))), sampler, now).head
    assert(plain.src_mask == 0 && plain.dst_mask == 0)
    assert(plain.next_hop.sameElements(Array[Byte](0, 0, 0, 0)))
  }

  test("extended-gateway (1003): AS path semantics incl empty-path router-AS fallback") {
    val hdr = SF.ipv4Frame(Array[Byte](10, 1, 2, 3), Array[Byte](10, 9, 9, 9),
      proto = 6, srcPort = 40000, dstPort = 443, tcpFlags = 16)
    val nh = Array[Byte](10, 98, 0, 9)
    // full path: next_hop_as = head, dst_as = tail, src_as from gateway
    val full = SF.decode(SF.encode(agent, 21L, Seq((1024L, 900L, hdr)),
      extGateway = Some((nh, 64512L, 64600L, 65001L, Seq(65001L, 65002L, 65003L)))),
      sampler, now).head
    assert(full.next_hop.sameElements(nh))
    assert(full.src_as == 64600L && full.next_hop_as == 65001L && full.dst_as == 65003L)
    // empty path (locally-originated route): dst_as falls back to the
    // ROUTER's AS; zero src_as falls back too; next_hop_as stays 0
    val local = SF.decode(SF.encode(agent, 22L, Seq((1024L, 900L, hdr)),
      extGateway = Some((nh, 64512L, 0L, 0L, Seq.empty))),
      sampler, now).head
    assert(local.src_as == 64512L && local.dst_as == 64512L && local.next_hop_as == 0L)
  }

  test("802.1Q VLAN tag is stepped over; UDP ports decode") {
    val hdr = SF.ipv4Frame(Array[Byte](10, 2, 0, 1), Array[Byte](10, 2, 0, 2),
      proto = 17, srcPort = 5353, dstPort = 53, vlan = true)
    val flows = SF.decode(SF.encode(agent, 12L, Seq((1000L, 200L, hdr))), sampler, now)
    val f = flows.head
    assert(f.etype == 0x800 && f.proto == 17)
    assert(f.src_port == 5353 && f.dst_port == 53 && f.tcp_flags == 0)
  }

  test("ICMP type/code land in icmp fields, not ports") {
    val hdr = SF.ipv4Frame(Array[Byte](10, 3, 0, 1), Array[Byte](10, 3, 0, 2),
      proto = 1, srcPort = 3, dstPort = 1) // type 3, code 1
    val f = SF.decode(SF.encode(agent, 13L, Seq((1L, 98L, hdr))), sampler, now).head
    assert(f.proto == 1 && f.icmp_type == 3 && f.icmp_code == 1)
    assert(f.src_port == 0 && f.dst_port == 0)
  }

  test("IPv6 frames dissect with etype 0x86dd") {
    val src6 = Array.tabulate[Byte](16)(i => (0x20 + i).toByte)
    val dst6 = Array.tabulate[Byte](16)(i => (0x30 + i).toByte)
    val hdr = new Array[Byte](14 + 40 + 8)
    hdr(12) = 0x86.toByte; hdr(13) = 0xdd.toByte // ethertype IPv6
    hdr(14) = 0x60 // version 6
    hdr(14 + 6) = 17 // next header UDP
    System.arraycopy(src6, 0, hdr, 14 + 8, 16)
    System.arraycopy(dst6, 0, hdr, 14 + 24, 16)
    hdr(54) = 0x13; hdr(55) = 0x88.toByte // src port 5000
    hdr(56) = 0; hdr(57) = 53 // dst port 53
    val f = SF.decode(SF.encode(agent, 14L, Seq((10L, 1400L, hdr))), sampler, now).head
    assert(f.etype == 0x86dd && f.proto == 17)
    assert(f.src_addr.sameElements(src6) && f.dst_addr.sameElements(dst6))
    assert(f.src_port == 5000 && f.dst_port == 53)
  }

  test("expanded flow samples (format 3) decode identically") {
    val hdr = SF.ipv4Frame(Array[Byte](10, 4, 0, 1), Array[Byte](10, 4, 0, 2),
      proto = 6, srcPort = 1234, dstPort = 80, tcpFlags = 2)
    val f = SF.decode(SF.encode(agent, 15L, Seq((512L, 60L, hdr)), expanded = true),
      sampler, now).head
    assert(f.sampling_rate == 512L && f.src_port == 1234 && f.dst_port == 80)
    assert(f.tcp_flags == 2)
  }

  test("non-IP frames and multi-sample datagrams") {
    val arp = new Array[Byte](42)
    arp(12) = 0x08; arp(13) = 0x06 // ethertype ARP
    val tcp = SF.ipv4Frame(Array[Byte](10, 5, 0, 1), Array[Byte](10, 5, 0, 2),
      proto = 6, srcPort = 1, dstPort = 2)
    val pkt = SF.encode(agent, 16L, Seq((1L, 64L, arp), (1L, 64L, tcp), (1L, 64L, tcp)))
    val flows = SF.decode(pkt, sampler, now)
    assert(flows.size == 2) // ARP skipped, both TCP samples decoded
    assert(flows.forall(_.proto == 6))
  }

  test("decode rejects malformed datagrams") {
    intercept[IllegalArgumentException](SF.decode(Array[Byte](0, 0, 0, 5), sampler, now))
    val bad = SF.encode(agent, 17L, Nil); bad(3) = 4 // version 4
    intercept[IllegalArgumentException](SF.decode(bad, sampler, now))
  }

  test("a flow sample shorter than its fixed fields is rejected, not underflowed") {
    // valid 28-byte header + sample declaring len=4: the fixed flow-sample
    // fields need 32 bytes — reading them would underflow past packet end
    val bb = java.nio.ByteBuffer.allocate(40)
    bb.putInt(5).putInt(1).put(agent).putInt(0) // header: v5, v4 agent, subAgent
    bb.putInt(7).putInt(123).putInt(1) // sequence, uptime, numSamples=1
    bb.putInt(1).putInt(4).putInt(0) // flow sample, len=4, 4 body bytes
    intercept[IllegalArgumentException](SF.decode(bb.array(), sampler, now))
  }

  test("counter samples round-trip by struct offset and never become flows") {
    val c = SF.IfCounters(ifIndex = 3, ifSpeed = 10000000000L,
      ifInOctets = 123456789L, ifInUcastPkts = 4242, ifInErrors = 7,
      ifOutOctets = 987654321L, ifOutUcastPkts = 2424, ifOutErrors = 1)
    val pkt = SF.encodeCounters(agent, 99L, Seq(c, c.copy(ifIndex = 4)))
    val (agentGot, got, hasFlow) = SF.decodeCounters(pkt)
    assert(agentGot.sameElements(agent))
    assert(got.ifc == Seq(c, c.copy(ifIndex = 4)) && !hasFlow)
    // counter datagrams decode to ZERO flows rows (metrics, not traffic)
    assert(SF.decode(pkt, sampler, now).isEmpty)
    // and a flow-sample datagram reports hasFlowSamples with no counters
    val hdr = SF.ipv4Frame(Array[Byte](10, 9, 0, 1), Array[Byte](10, 9, 0, 2),
      proto = 17, srcPort = 1, dstPort = 2)
    val (_, none, hf) = SF.decodeCounters(SF.encode(agent, 100L, Seq((1L, 64L, hdr))))
    assert(!none.nonEmpty && hf)
  }

  test("mixed counter-record datagram: ethernet/vlan/processor beside if-counters") {
    // one sample carrying all four record formats, the shape a real switch
    // agent emits (goflow v3.4.5 decodes the same structs)
    val ifc = SF.IfCounters(ifIndex = 7, ifSpeed = 40000000000L,
      ifInOctets = 111L, ifInUcastPkts = 11, ifInErrors = 1,
      ifOutOctets = 222L, ifOutUcastPkts = 22, ifOutErrors = 2)
    val eth = SF.EthernetCounters(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)
    val vlan = SF.VlanCounters(vlanId = 42, octets = 9999L, ucastPkts = 55,
      multicastPkts = 5, broadcastPkts = 3, discards = 2)
    val proc = SF.ProcessorCounters(cpu5s = 17, cpu1m = 12, cpu5m = 9,
      totalMemory = 8L << 30, freeMemory = 2L << 30)
    val pkt = SF.encodeCounterRecords(agent, 101L,
      Seq(SF.ifRecord(ifc), SF.ethernetRecord(eth), SF.vlanRecord(vlan),
        SF.processorRecord(proc)), sourceId = 7L)
    val (agentGot, got, hasFlow) = SF.decodeCounters(pkt)
    assert(agentGot.sameElements(agent) && !hasFlow)
    assert(got.ifc == Seq(ifc))
    // ethernet records attribute to the sample's source index (7)
    assert(got.eth == Seq((7L, eth)))
    assert(got.vlan == Seq(vlan))
    assert(got.proc == Seq(proc))
    // still zero flows rows — counters are metrics, not traffic
    assert(SF.decode(pkt, sampler, now).isEmpty)
  }

  test("unknown counter-record formats are skipped by declared length") {
    val vlan = SF.VlanCounters(1, 10L, 1, 0, 0, 0)
    // an enterprise-0 format-99 record (unknown) preceding a known one
    val pkt = SF.encodeCounterRecords(agent, 102L,
      Seq((99, Array.fill[Byte](12)(0x7f.toByte)), SF.vlanRecord(vlan)))
    val (_, got, _) = SF.decodeCounters(pkt)
    assert(got.vlan == Seq(vlan) && got.ifc.isEmpty && got.eth.isEmpty)
  }
}
