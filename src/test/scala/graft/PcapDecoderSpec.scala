package graft

import java.io.ByteArrayInputStream

import graft.sources.Pcap

/** Decoder spec: synthesize → decode round-trips + never-throws resilience
  * (SURVEY §5.2/§5.3; reference contract PcapKpiExtractor.scala:109-117). */
class PcapDecoderSpec extends SparkSpec {

  test("TCP packet round-trips all parsed fields") {
    val bytes = Pcap.synthesize(Seq((1700000100L, 250000L, 7, 9, 443, 51000, 6, 123456789L, 0x12, 8192, 40)))
    val pkts = Pcap.decodeStream(new ByteArrayInputStream(bytes), "eMBB", "t.pcap").toList
    assert(pkts.size == 1)
    val p = pkts.head
    assert(p.protocol == "TCP")
    assert(p.srcIp == "10.0.0.7" && p.dstIp == "10.0.0.9")
    assert(p.srcPort == 443 && p.dstPort == 51000)
    assert(p.tcpSeq == 123456789L && p.tcpFlags == 0x12 && p.tcpWindow == 8192)
    assert(p.ethertype == 0x0800)
    assert(math.abs(p.timestamp - (1700000100.25)) < 1e-9)
    assert(p.flowId == "10.0.0.7_10.0.0.9_443_51000_TCP")
    assert(p.capturedLen == 14 + 20 + 20 + 40)
  }

  test("UDP packet parses ports, no TCP fields") {
    val bytes = Pcap.synthesize(Seq((1700000000L, 0L, 1, 2, 5353, 5353, 17, 0L, 0, 0, 8)))
    val p = Pcap.decodeStream(new ByteArrayInputStream(bytes), "s", "f").toList.head
    assert(p.protocol == "UDP" && p.srcPort == 5353 && p.tcpSeq == 0L && p.tcpWindow == 0)
  }

  test("multiple packets decode in order; cap respected") {
    val specs = (0 until 50).map(i =>
      (1700000000L + i, 0L, 1, 2, 1000 + i, 80, 6, i.toLong, 0x10, 100, 0))
    val bytes = Pcap.synthesize(specs)
    val all = Pcap.decodeStream(new ByteArrayInputStream(bytes), "s", "f").toList
    assert(all.size == 50)
    assert(all.map(_.srcPort) == (1000 until 1050).toList)
    val capped = Pcap.decodeStream(new ByteArrayInputStream(bytes), "s", "f", maxPackets = 10).toList
    assert(capped.size == 10)
  }

  test("truncated file decodes the complete prefix, never throws") {
    val bytes = Pcap.synthesize(Seq(
      (1L, 0L, 1, 2, 10, 20, 6, 0L, 0, 0, 0),
      (2L, 0L, 1, 2, 10, 20, 6, 0L, 0, 0, 0)))
    val cut = bytes.take(bytes.length - 7)
    val pkts = Pcap.decodeStream(new ByteArrayInputStream(cut), "s", "f").toList
    assert(pkts.size == 1)
  }

  test("raw-IP frame (no Ethernet layer) decodes via the offset-0 fallback") {
    // DLT_RAW capture: the record payload starts directly at the IPv4 header
    // (reference PcapKpiExtractor.scala:161-164 parses at offset 0 when the
    // ethertype is unknown, guarded by the version nibble).
    val bb = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def w16be(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    w32le(0xa1b2c3d4L); w16be(0); w16be(0)
    w32le(0); w32le(0); w32le(65535); w32le(101) // network = LINKTYPE_RAW
    val ipLen = 20 + 8 // IPv4 + UDP, no payload
    w32le(5L); w32le(250000L); w32le(ipLen); w32le(ipLen)
    bb.write(0x45); bb.write(0); w16be(ipLen); w16be(0); w16be(0)
    bb.write(64); bb.write(17); w16be(0)
    bb.write(10); bb.write(0); bb.write(0); bb.write(1)
    bb.write(10); bb.write(0); bb.write(0); bb.write(2)
    w16be(5353); w16be(53); w16be(8); w16be(0)
    val p = Pcap.decodeStream(new ByteArrayInputStream(bb.toByteArray), "s", "raw.pcap").toList.head
    assert(p.protocol == "UDP")
    assert(p.srcIp == "10.0.0.1" && p.dstIp == "10.0.0.2")
    assert(p.srcPort == 5353 && p.dstPort == 53)
    assert(math.abs(p.timestamp - 5.25) < 1e-9)
  }

  test("ethernet frame with non-IP ethertype still degrades to OTHER") {
    // ARP-ish frame: ethertype 0x0806, body not a valid IPv4 header — the
    // offset-0 fallback must not misfire (dest MAC first nibble != 4).
    val bb = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def w16be(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    w32le(0xa1b2c3d4L); w16be(0); w16be(0)
    w32le(0); w32le(0); w32le(65535); w32le(1)
    val cap = 14 + 28
    w32le(7L); w32le(0L); w32le(cap); w32le(cap)
    (0 until 12).foreach(_ => bb.write(0x00)) // MACs: first nibble 0, not 4
    w16be(0x0806) // ARP
    (0 until 28).foreach(_ => bb.write(0x01))
    val p = Pcap.decodeStream(new ByteArrayInputStream(bb.toByteArray), "s", "arp.pcap").toList.head
    assert(p.protocol == "OTHER" && p.srcIp == "" && p.ethertype == 0x0806)
  }

  test("ethernet IPv6 frame with a 0x4X-leading MAC does not misdecode as raw IPv4") {
    // Regression: an offset-0 retry gated only on the version nibble (the
    // reference's shape) sees dest-MAC byte 0x44 as "IPv4 version 4" and
    // fabricates a flow from MAC/payload bytes. The linktype gate must
    // keep this frame OTHER.
    val bb = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def w16be(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    w32le(0xa1b2c3d4L); w16be(0); w16be(0)
    w32le(0); w32le(0); w32le(65535); w32le(1) // network = LINKTYPE_ETHERNET
    val cap = 14 + 40
    w32le(9L); w32le(0L); w32le(cap); w32le(cap)
    bb.write(0x44); (0 until 11).foreach(_ => bb.write(0x55)) // MACs, first byte 0x44
    w16be(0x86dd) // IPv6
    (0 until 40).foreach(i => bb.write(0x60 + (i % 7)))
    val p = Pcap.decodeStream(new ByteArrayInputStream(bb.toByteArray), "s", "v6.pcap").toList.head
    assert(p.protocol == "OTHER" && p.srcIp == "" && p.dstIp == "")
    assert(p.ethertype == 0x86dd)
  }

  test("non-raw non-Ethernet linktype (LINUX_SLL) degrades to OTHER even when its link header leads with nibble 4") {
    // LINUX_SLL (113) has a 16-byte link header the decoder does not parse.
    // A first byte of 0x40 would pass the version-nibble guard, so only the
    // raw-linktype whitelist (101/12) keeps this frame from fabricating an
    // IPv4 flow out of link-header bytes (ADVICE round 4).
    val bb = new java.io.ByteArrayOutputStream()
    def w32le(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def w16be(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    w32le(0xa1b2c3d4L); w16be(0); w16be(0)
    w32le(0); w32le(0); w32le(65535); w32le(113) // network = LINKTYPE_LINUX_SLL
    val cap = 16 + 28 // SLL header + body
    w32le(11L); w32le(0L); w32le(cap); w32le(cap)
    bb.write(0x45) // SLL packet-type byte crafted to look like "IPv4, IHL=5"
    (0 until 15).foreach(_ => bb.write(0x06)) // rest of the SLL header
    (0 until 28).foreach(_ => bb.write(0x11))
    val p = Pcap.decodeStream(new ByteArrayInputStream(bb.toByteArray), "s", "sll.pcap").toList.head
    assert(p.protocol == "OTHER" && p.srcIp == "" && p.dstIp == "")
  }

  test("property: decode never throws on arbitrary bytes (500 seeded cases)") {
    (0 until 500).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val junk = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(junk)
      // also try valid-magic prefixes followed by garbage
      if (seed % 3 == 0 && junk.length >= 4) {
        junk(0) = 0xd4.toByte; junk(1) = 0xc3.toByte
        junk(2) = 0xb2.toByte; junk(3) = 0xa1.toByte
      }
      val out = Pcap.decodeStream(new ByteArrayInputStream(junk), "s", "f").toList
      assert(out != null)
    }
  }

  test("distributed decode through binaryFiles plan shape (parallelize stand-in)") {
    val sc = spark.sparkContext
    val files = (0 until 4).map { f =>
      (s"f$f", Pcap.synthesize((0 until 25).map(i =>
        (1700000000L + i, 0L, f + 1, 2, 1000 + i, 80, if (i % 2 == 0) 6 else 17, i.toLong, 0x10, 10, 5))))
    }
    val rdd = sc.parallelize(files, 4).flatMap { case (name, bytes) =>
      Pcap.decodeStream(new ByteArrayInputStream(bytes), "slice", name)
    }
    import spark.implicits._
    val df = rdd.toDF()
    assert(df.count() == 100)
    assert(df.select("protocol").distinct().count() == 2)
  }
}
