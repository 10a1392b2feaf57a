package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 generic-region codec evidence, mirroring the CCITT pattern:
  * the MMR path cross-validates against the JDK's INDEPENDENT T.6
  * encoder; the arithmetic path round-trips through the from-spec MQ
  * encoder (any single-decision divergence derails the arithmetic
  * state, so pixel-exact round-trip over thousands of decisions is
  * strong mutual evidence); and end-to-end PDF decode is pinned. */
class Jbig2Spec extends AnyFunSuite {

  private def bitmap(w: Int, h: Int)(black: (Int, Int) => Boolean): Jbig2.Bitmap = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) if (black(x, y)) px(y * w + x) = 1
    Jbig2.Bitmap(w, h, px)
  }

  test("MQ encoder reproduces the published ITU-T T.88 Annex H.2 test sequence byte-exactly") {
    // the spec's known-answer test: 256 decisions (the 32 test-data
    // bytes MSB-first) through ONE context starting at state 0/MPS 0
    // must code to exactly the published 30-byte sequence — the same
    // vector appears in ISO/IEC 14492 and the JPEG 2000 spec (same
    // coder). The decoder must also read the decisions back from it.
    val testData = Array(0x00, 0x02, 0x00, 0x51, 0x00, 0x00, 0x00, 0xC0,
      0x03, 0x52, 0x87, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
      0x82, 0xC0, 0x20, 0x00, 0xFC, 0xD7, 0x9E, 0xF6,
      0xBF, 0x7F, 0xED, 0x90, 0x4F, 0x46, 0xA3, 0xBF)
    val expected = Array(0x84, 0xC7, 0x3B, 0xFC, 0xE1, 0xA1, 0x43, 0x04,
      0x02, 0x20, 0x00, 0x00, 0x41, 0x0D, 0xBB, 0x86,
      0xF4, 0x31, 0x7F, 0xFF, 0x88, 0xFF, 0x37, 0x47,
      0x1A, 0xDB, 0x6A, 0xDF, 0xFF, 0xAC)
    val bits = testData.flatMap(b => (7 to 0 by -1).map(i => (b >> i) & 1))
    val encI = new Array[Byte](1); val encM = new Array[Byte](1)
    val enc = new Jbig2.MqEncoder
    bits.foreach(d => enc.encode(encI, encM, 0, d))
    val out = enc.flush()
    assert(out.map(_ & 0xff).toSeq == expected.toSeq,
      "coded bytes: " + out.map(b => f"${b & 0xff}%02X").mkString(" "))
    val decI = new Array[Byte](1); val decM = new Array[Byte](1)
    val dec = new Jbig2.MqDecoder(out)
    for (i <- bits.indices)
      assert(dec.decode(decI, decM, 0) == bits(i), s"decode diverged at bit $i")
  }

  test("MQ coder round-trips random decision sequences over many contexts") {
    for (seed <- Seq(1, 17, 4242)) {
      val rnd = new scala.util.Random(seed)
      val n = 5000
      val ctxCount = 64
      val decisions = Array.fill(n)(rnd.nextInt(2))
      val ctxs = Array.fill(n)(rnd.nextInt(ctxCount))
      val encI = new Array[Byte](ctxCount); val encM = new Array[Byte](ctxCount)
      val enc = new Jbig2.MqEncoder
      for (i <- 0 until n) enc.encode(encI, encM, ctxs(i), decisions(i))
      val bytes = enc.flush()
      val decI = new Array[Byte](ctxCount); val decM = new Array[Byte](ctxCount)
      val dec = new Jbig2.MqDecoder(bytes)
      for (i <- 0 until n)
        assert(dec.decode(decI, decM, ctxs(i)) == decisions(i),
          s"seed=$seed diverged at decision $i")
    }
  }

  test("MQ coder round-trips skewed (mostly-MPS) sequences — the compression-relevant regime") {
    val rnd = new scala.util.Random(7)
    val n = 20000
    val decisions = Array.fill(n)(if (rnd.nextInt(100) < 3) 1 else 0)
    val encI = new Array[Byte](4); val encM = new Array[Byte](4)
    val enc = new Jbig2.MqEncoder
    decisions.foreach(d => enc.encode(encI, encM, 0, d))
    val bytes = enc.flush()
    // 3%-LPS stream must actually compress (sanity that states adapt)
    assert(bytes.length < n / 8 / 2, s"no compression: ${bytes.length} bytes for $n decisions")
    val decI = new Array[Byte](4); val decM = new Array[Byte](4)
    val dec = new Jbig2.MqDecoder(bytes)
    for (i <- 0 until n) assert(dec.decode(decI, decM, 0) == decisions(i), s"at $i")
  }

  test("generic region round-trips: templates 0-3 × TPGDON × structured and random bitmaps") {
    val pats: Seq[(String, (Int, Int) => Boolean)] = Seq(
      "diag" -> ((x, y) => (x + 2 * y) % 4 == 0),
      "vbars" -> ((x, _) => x % 3 == 0),
      "blank-rows" -> ((x, y) => y % 4 == 1 && x % 2 == 0) // TPGDON-friendly
    )
    for {
      template <- 0 to 3
      tpgdon <- Seq(false, true)
      (name, pat) <- pats
    } {
      val bm = bitmap(23, 17)(pat)
      val data = Jbig2.encodeGeneric(bm, template, Jbig2.nominalAt(template), tpgdon)
      val back = Jbig2.decodeGeneric(data, 23, 17, template, Jbig2.nominalAt(template), tpgdon)
      assert(back.px.toSeq == bm.px.toSeq, s"template=$template tpgdon=$tpgdon pat=$name")
    }
    val rnd = new scala.util.Random(23)
    val noisy = bitmap(31, 19)((_, _) => rnd.nextInt(4) == 0)
    for (template <- 0 to 3) {
      val data = Jbig2.encodeGeneric(noisy, template, Jbig2.nominalAt(template), tpgdon = false)
      val back = Jbig2.decodeGeneric(data, 31, 19, template, Jbig2.nominalAt(template), tpgdon = false)
      assert(back.px.toSeq == noisy.px.toSeq, s"random bitmap template=$template")
    }
  }

  test("MMR generic region: JDK-encoded T.6 payload decodes pixel-exact (independent cross-check)") {
    for ((w, h, seed) <- Seq((16, 10, 3), (40, 12, 9), (9, 30, 27))) {
      val rnd = new scala.util.Random(seed)
      val cells = Array.fill(h, w)(rnd.nextInt(3) == 0)
      val bm = bitmap(w, h)((x, y) => cells(y)(x))
      val stream = Jbig2.buildEmbedded(bm, mmr = true)
      val (gw, gh, gray) = Jbig2.decodeEmbedded(Array.emptyByteArray, stream)
      assert((gw, gh) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert((gray(y * w + x) == 0) == cells(y)(x), s"($x,$y) seed=$seed")
    }
  }

  test("embedded stream with arithmetic region decodes through the segment layer") {
    val bm = bitmap(20, 14)((x, y) => (x * y) % 5 == 0)
    for (tpgdon <- Seq(false, true)) {
      val stream = Jbig2.buildEmbedded(bm, mmr = false, template = 0, tpgdon = tpgdon)
      val (gw, gh, gray) = Jbig2.decodeEmbedded(Array.emptyByteArray, stream)
      assert((gw, gh) == (20, 14))
      for (y <- 0 until 14; x <- 0 until 20)
        assert((gray(y * 20 + x) == 0) == ((x * y) % 5 == 0), s"($x,$y) tpgdon=$tpgdon")
    }
  }

  test("PDF end-to-end: /JBIG2Decode image XObject → PNG, both coding modes") {
    for (mmr <- Seq(false, true)) {
      val pdf = PdfBuilder.withJbig2ImagePattern(12, 8,
        (x, y) => (x + y) % 3 == 0, mmr = mmr)
      val images = PdfImages.documentImages("jb", pdf)
      assert(images.size == 1, s"mmr=$mmr")
      val im = images.head
      assert(im.width == 12 && im.height == 8)
      val (pw, ph, rgba) = PdfImages.decodePng(im.bytes).get
      assert((pw, ph) == (12, 8))
      for (y <- 0 until 8; x <- 0 until 12) {
        val black = (rgba((y * 12 + x) * 4) & 0xff) == 0
        assert(black == ((x + y) % 3 == 0), s"($x,$y) mmr=$mmr")
      }
    }
  }

  test("arithmetic-integer coder (Annex A) round-trips every ladder branch, signs, and OOB") {
    val values = Seq(0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 100000,
      123456789, -1, -3, -4, -19, -20, -84, -340, -4436, -987654, Jbig2.OOB)
    val rnd = new scala.util.Random(41)
    val mixed = values ++ Seq.fill(500)(rnd.nextInt(20000) - 10000) ++
      Seq.fill(50)(Jbig2.OOB)
    val enc = new Jbig2.MqEncoder
    val ecx = Array.fill(3)(new Jbig2.IntCtx) // interleave several procedures
    mixed.zipWithIndex.foreach { case (v, i) => Jbig2.encodeInt(enc, ecx(i % 3), v) }
    val bytes = enc.flush()
    val dec = new Jbig2.MqDecoder(bytes)
    val dcx = Array.fill(3)(new Jbig2.IntCtx)
    mixed.zipWithIndex.foreach { case (v, i) =>
      assert(Jbig2.decodeInt(dec, dcx(i % 3)) == v, s"at $i value $v")
    }
  }

  test("IAID symbol-id coder round-trips across code lengths") {
    for (numSyms <- Seq(1, 2, 3, 5, 17, 300)) {
      val len = Jbig2.symCodeLenFor(numSyms)
      val rnd = new scala.util.Random(numSyms)
      val ids = Seq.fill(200)(rnd.nextInt(numSyms))
      val enc = new Jbig2.MqEncoder
      val ecx = new Jbig2.IdCtx(len)
      ids.foreach(id => Jbig2.encodeId(enc, ecx, id))
      val dec = new Jbig2.MqDecoder(enc.flush())
      val dcx = new Jbig2.IdCtx(len)
      ids.foreach(id => assert(Jbig2.decodeId(dec, dcx) == id, s"numSyms=$numSyms"))
    }
  }

  test("symbol dictionary round-trips: height classes, widths, shared generic contexts") {
    val rnd = new scala.util.Random(77)
    // heights ascending with repeated classes; varied widths
    val dims = Seq((3, 2), (5, 2), (4, 4), (6, 4), (2, 4), (7, 5))
    val syms = dims.map { case (w, h) =>
      val px = Array.fill[Byte](w * h)(if (rnd.nextInt(3) == 0) 1 else 0)
      Jbig2.Bitmap(w, h, px)
    }.toVector
    for (template <- Seq(0, 2)) {
      val data = Jbig2.encodeSymbolDict(syms, template)
      val back = Jbig2.decodeSymbolDict(data)
      assert(back.length == syms.length, s"template=$template")
      for (i <- syms.indices) {
        assert((back(i).w, back(i).h) == (syms(i).w, syms(i).h), s"sym $i dims")
        assert(back(i).px.toSeq == syms(i).px.toSeq, s"sym $i pixels template=$template")
      }
    }
  }

  test("text region end-to-end: symbol dict + strip-coded instances reproduce the page") {
    val syms = Vector(
      bitmap(3, 2)((x, y) => (x + y) % 2 == 0),
      bitmap(4, 3)((x, y) => x == 0 || y == 2),
      bitmap(5, 4)((x, y) => (x * y) % 3 == 0))
    val instances = Seq(
      Jbig2.TextInstance(0, 1, 1), Jbig2.TextInstance(2, 10, 0),
      Jbig2.TextInstance(1, 20, 2), Jbig2.TextInstance(1, 2, 8),
      Jbig2.TextInstance(0, 12, 9), Jbig2.TextInstance(2, 18, 7))
    val (w, h) = (26, 14)
    val stream = Jbig2.buildEmbeddedText(w, h, syms, instances)
    val (gw, gh, gray) = Jbig2.decodeEmbedded(Array.emptyByteArray, stream)
    assert((gw, gh) == (w, h))
    // expected: OR-draw each instance TOPLEFT onto a white page
    val exp = new Array[Byte](w * h)
    instances.foreach { in =>
      val s = syms(in.id)
      for (y <- 0 until s.h; x <- 0 until s.w if s.px(y * s.w + x) == 1)
        exp((in.t + y) * w + (in.s + x)) = 1
    }
    for (y <- 0 until h; x <- 0 until w)
      assert((gray(y * w + x) == 0) == (exp(y * w + x) == 1), s"($x,$y)")
  }

  test("Huffman tables: B.1-B.5 canonical codewords decode from hand-laid bit patterns") {
    def read(tab: Jbig2.HuffTable, bytes: Int*): Int =
      tab.decode(new Jbig2.BitReader(bytes.map(_.toByte).toArray))
    // B.1: code 0 + 4 range bits (value 5 = 0b0_0101_000...)
    assert(read(Jbig2.TableB1, 0x28) == 5)
    // B.1: code 10 + 8 range bits (16 + 3 -> 0b10_00000011)
    assert(read(Jbig2.TableB1, 0x80, 0xC0) == 19)
    // B.2: single-bit code 0 -> 0; 10 -> 1; 110 -> 2
    assert(read(Jbig2.TableB2, 0x00) == 0)
    assert(read(Jbig2.TableB2, 0x80) == 1)
    assert(read(Jbig2.TableB2, 0xC0) == 2)
    // B.2 OOB codeword = 111111
    assert(read(Jbig2.TableB2, 0xFC) == Jbig2.OOB)
    // B.4: shifted B.2 (0 -> 1); upper = 11111 + 32 bits
    assert(read(Jbig2.TableB4, 0x00) == 1)
    assert(read(Jbig2.TableB4, 0xF8, 0, 0, 0, 0x20) == 76 + 4)
    // B.3 lower range: 11111111 + 32 bits of 2 -> -257 - 2
    assert(read(Jbig2.TableB3, 0xFF, 0, 0, 0, 0x02) == -259)
    // B.5 first line: 1111110 + 8 bits (value -255 + 7)
    assert(read(Jbig2.TableB5, 0xFC, 0x0E) == -248)
    // encode/decode round-trip across line kinds
    Seq(Jbig2.TableB1 -> Seq(0, 15, 16, 271, 272, 70000, 65808, 70000000),
      Jbig2.TableB2 -> Seq(0, 1, 2, 3, 10, 11, 74, 75, 1000),
      Jbig2.TableB3 -> Seq(-256, -1, -257, -500, 0, 74, 75, 2000),
      Jbig2.TableB4 -> Seq(1, 2, 3, 4, 11, 12, 75, 76, 5000),
      Jbig2.TableB5 -> Seq(-255, -1, -256, -999, 1, 12, 76, 123456)).foreach {
      case (tab, vals) => vals.foreach { v =>
        val w = new Jbig2.BitWriter
        tab.encode(w, v)
        assert(tab.decode(new Jbig2.BitReader(w.result())) == v, s"value $v")
      }
    }
  }

  test("custom code-table segments (§B.2) round-trip incl. lower/upper/OOB escapes") {
    val body = Jbig2.encodeTableSegment(Seq((2, 4), (1, 6)), low = -5, high = 75,
      lowerPref = 3, upperPref = 4, oobPref = 4)
    val tab = Jbig2.parseTableSegment(body)
    Seq(-5, 0, 10, 11, 74, -6, -100, 75, 500).foreach { v =>
      val w = new Jbig2.BitWriter
      tab.encode(w, v)
      assert(tab.decode(new Jbig2.BitReader(w.result())) == v, s"value $v")
    }
    val w = new Jbig2.BitWriter
    tab.encodeOob(w)
    assert(tab.decode(new Jbig2.BitReader(w.result())) == Jbig2.OOB)
  }

  test("HUFFMAN symbol dictionary round-trips: uncompressed and MMR collective bitmaps") {
    val syms = Vector(
      bitmap(3, 2)((x, y) => (x + y) % 2 == 0),
      bitmap(7, 2)((x, y) => x % 3 == 0),
      bitmap(4, 3)((x, y) => x == 0 || y == 2),
      bitmap(5, 4)((x, y) => (x * y) % 3 == 0))
    for (mmr <- Seq(false, true)) {
      val got = Jbig2.decodeSymbolDict(Jbig2.encodeSymbolDictHuff(syms, mmr))
      assert(got.length == syms.length, s"mmr=$mmr")
      got.zip(syms).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g.w == e.w && g.h == e.h, s"mmr=$mmr sym $i dims")
        assert(g.px.toSeq == e.px.toSeq, s"mmr=$mmr sym $i pixels")
      }
    }
  }

  test("custom-table SYMBOL-dict selectors: DH/DW route through table segments (cursor order)") {
    val syms = Vector(
      bitmap(3, 2)((x, y) => (x + y) % 2 == 0),
      bitmap(4, 3)((x, y) => x == 0 || y == 2))
    // selector-0 encoding, then flip DH and DW to CUSTOM (3): flags
    // low byte = SDHUFF(1) | DH=3<<2 | DW=3<<4
    val body = Jbig2.encodeSymbolDictHuff(syms).clone()
    body(1) = 0x3D.toByte
    // custom tables whose normal/upper/OOB lines REPRODUCE B.4/B.2's
    // ranges and canonical codes (the mandatory lower-range line gets
    // a longer prefix, appearing after — normal-code assignment is
    // unchanged and the encoder never emits the lower escape)
    val dhTab = Jbig2.parseTableSegment(Jbig2.encodeTableSegment(
      Seq((1, 0), (2, 0), (3, 0), (4, 3), (5, 6)), low = 1, high = 76,
      lowerPref = 6, upperPref = 5))
    val dwTab = Jbig2.parseTableSegment(Jbig2.encodeTableSegment(
      Seq((1, 0), (2, 0), (3, 0), (4, 3), (5, 6)), low = 0, high = 75,
      lowerPref = 7, upperPref = 6, oobPref = 6))
    val got = Jbig2.decodeSymbolDict(body, Vector(dhTab, dwTab))
    assert(got.length == syms.length)
    got.zip(syms).foreach { case (g, e) =>
      assert(g.w == e.w && g.h == e.h && g.px.toSeq == e.px.toSeq)
    }
  }

  test("HUFFMAN text stream end-to-end ≡ the arithmetic stream's page, custom FS/DS/DT tables") {
    val syms = Vector(
      bitmap(3, 2)((x, y) => (x + y) % 2 == 0),
      bitmap(4, 3)((x, y) => x == 0 || y == 2),
      bitmap(5, 4)((x, y) => (x * y) % 3 == 0))
    val instances = Seq(
      Jbig2.TextInstance(0, 1, 1), Jbig2.TextInstance(2, 10, 0),
      Jbig2.TextInstance(1, 20, 2), Jbig2.TextInstance(1, 2, 8),
      Jbig2.TextInstance(0, 12, 9), Jbig2.TextInstance(2, 18, 7))
    val (w, h) = (26, 14)
    val arith = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedText(w, h, syms, instances))
    val huff = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedTextHuff(w, h, syms, instances))
    assert(huff._1 == arith._1 && huff._2 == arith._2)
    assert(huff._3.toSeq == arith._3.toSeq,
      "Huffman and arithmetic decodes must produce the identical page")
    // MMR collective-bitmap variant too
    val huffMmr = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedTextHuff(w, h, syms, instances, mmr = true))
    assert(huffMmr._3.toSeq == arith._3.toSeq)
  }

  test("runcode 32 after a 33/34 zero-run repeats ZERO, not the stale pre-run length (§7.4.3.1.2)") {
    // 7-symbol pool, only symbol 0 carries a code: length 1 directly,
    // then a 3-zero run (code 33), then code 32 ×3 — which must repeat
    // the zero fill. A decoder repeating the stale pre-run length 1
    // would give four length-1 codes (an invalid prefix code) and
    // could never reproduce the page.
    val syms = Vector.tabulate(7)(k =>
      bitmap(3, 2)((x, y) => (x + y + k) % 2 == 0))
    val instances = Seq(
      Jbig2.TextInstance(0, 1, 1), Jbig2.TextInstance(0, 8, 3),
      Jbig2.TextInstance(0, 15, 0))
    val (w, h) = (20, 8)
    val script = Seq((1, 0), (33, 3), (32, 3))
    val arith = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedText(w, h, syms, instances))
    val huff = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedTextHuff(w, h, syms, instances, symLenRuns = script))
    assert(huff._1 == arith._1 && huff._2 == arith._2)
    assert(huff._3.toSeq == arith._3.toSeq,
      "zero-run + repeat-run symbol-ID lengths must reproduce the page")
  }

  test("dict AND region custom tables in ONE stream bind per referred-to wiring, not stream order") {
    // the dict's DH/DW tables precede the region's FS/DS/DT tables in
    // the stream; a shared stream-ordered pool (each consumer
    // restarting at index 0) would hand the region the dict's tables
    // and corrupt — or error — the decode. Referred-to wiring binds
    // each segment exactly the tables it names.
    val syms = Vector(
      bitmap(3, 2)((x, y) => (x + y) % 2 == 0),
      bitmap(4, 3)((x, y) => x == 0 || y == 2),
      bitmap(5, 4)((x, y) => (x * y) % 3 == 0))
    val instances = Seq(
      Jbig2.TextInstance(0, 1, 1), Jbig2.TextInstance(2, 10, 0),
      Jbig2.TextInstance(1, 20, 2), Jbig2.TextInstance(1, 2, 8))
    val (w, h) = (26, 14)
    // custom DH/DW tables reproducing B.4/B.2's ranges and codes (as
    // in the SYMBOL-dict selector test) so the selector-0-encoded
    // dict body decodes identically through the custom route
    val dhTable = Jbig2.encodeTableSegment(
      Seq((1, 0), (2, 0), (3, 0), (4, 3), (5, 6)), low = 1, high = 76,
      lowerPref = 6, upperPref = 5)
    val dwTable = Jbig2.encodeTableSegment(
      Seq((1, 0), (2, 0), (3, 0), (4, 3), (5, 6)), low = 0, high = 75,
      lowerPref = 7, upperPref = 6, oobPref = 6)
    val arith = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedText(w, h, syms, instances))
    val got = Jbig2.decodeEmbedded(Array.emptyByteArray,
      Jbig2.buildEmbeddedTextHuffCustomDict(w, h, syms, instances,
        dhTable, dwTable))
    assert(got._1 == arith._1 && got._2 == arith._2)
    assert(got._3.toSeq == arith._3.toSeq,
      "custom-dict + custom-region stream must reproduce the arithmetic page")
  }

  test("standard text-table selectors are a DECLARED error (B.6-B.13 out of scope)") {
    val syms = Vector(bitmap(3, 2)((x, y) => (x + y) % 2 == 0))
    val body = Jbig2.encodeTextRegionHuff(10, 6, Seq(Jbig2.TextInstance(0, 1, 1)), syms)
    // flip the Huffman-flags FS selector from 3 (custom) to 0 (B.6)
    body(19 + 1) = (body(20) & ~0x03).toByte
    val e = intercept[Jbig2.Jbig2Exception] {
      Jbig2.decodeTextRegion(body, syms,
        Vector(Jbig2.parseTableSegment(Jbig2.fixtureFsTable),
          Jbig2.parseTableSegment(Jbig2.fixtureDsTable),
          Jbig2.parseTableSegment(Jbig2.fixtureDtTable)))
    }
    assert(e.getMessage.contains("FS"))
  }

  test("PDF end-to-end: scanned-TEXT JBIG2 (symbol dict + text region) → PNG") {
    val pdf = PdfBuilder.withJbig2TextPattern(seed = 5, nInst = 9)
    val images = PdfImages.documentImages("tx", pdf)
    assert(images.size == 1)
    val im = images.head
    assert(im.width == 32 && im.height == 18)
    val (pw, ph, rgba) = PdfImages.decodePng(im.bytes).get
    assert((pw, ph) == (32, 18))
    // recompute the closed-form page: glyph i%3 at ((i%4)*8, (i/4)*6)
    val exp = new Array[Boolean](32 * 18)
    for (i <- 0 until 9) {
      val g = i % 3; val s = (i % 4) * 8; val t = (i / 4) * 6
      for (y <- 0 until 2 + g; x <- 0 until 3 + g if (x + y + g + 5) % 2 == 0)
        exp((t + y) * 32 + (s + x)) = true
    }
    for (y <- 0 until 18; x <- 0 until 32)
      assert(((rgba((y * 32 + x) * 4) & 0xff) == 0) == exp(y * 32 + x), s"($x,$y)")
  }

  test("PDF dict /Width /Height GOVERN over JBIG2 page dims: clip and pad paths") {
    // JBIG2 page info declares 10×8, the image dict 7×5 → output must
    // be the dict's 7×5 (top-left clip), per PDF 32000 §7.4.7
    val clip = PdfBuilder.withJbig2ImagePattern(10, 8, (x, y) => (x + y) % 2 == 0,
      declaredW = 7, declaredH = 5)
    val imC = PdfImages.documentImages("cl", clip).head
    assert(imC.width == 7 && imC.height == 5)
    val (cw, ch, crgba) = PdfImages.decodePng(imC.bytes).get
    assert((cw, ch) == (7, 5))
    for (y <- 0 until 5; x <- 0 until 7)
      assert(((crgba((y * 7 + x) * 4) & 0xff) == 0) == ((x + y) % 2 == 0), s"clip ($x,$y)")
    // dict larger than the JBIG2 page → white padding beyond the page
    val pad = PdfBuilder.withJbig2ImagePattern(6, 4, (_, _) => true,
      declaredW = 9, declaredH = 6)
    val imP = PdfImages.documentImages("pd", pad).head
    assert(imP.width == 9 && imP.height == 6)
    val (pw2, ph2, prgba) = PdfImages.decodePng(imP.bytes).get
    assert((pw2, ph2) == (9, 6))
    for (y <- 0 until 6; x <- 0 until 9) {
      val expectBlack = x < 6 && y < 4
      assert(((prgba((y * 9 + x) * 4) & 0xff) == 0) == expectBlack, s"pad ($x,$y)")
    }
  }

  test("fail-soft: garbage stream and unsupported (symbol/text) segments give declared errors") {
    intercept[Jbig2.Jbig2Exception] {
      Jbig2.decodeEmbedded(Array.emptyByteArray, Array[Byte](0, 0))
    }
    // a halftone-region segment (type 22) must be REJECTED, not misdecoded
    val halftone = Array[Byte](0, 0, 0, 1, 22, 0, 1, 0, 0, 0, 0)
    val e = intercept[Jbig2.Jbig2Exception] {
      Jbig2.decodeEmbedded(Array.emptyByteArray, halftone)
    }
    assert(e.getMessage.contains("unsupported segment type"))
    // a truncated symbol dictionary fails with a DECLARED error too
    val symDict = Array[Byte](0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 1, 9)
    val e2 = intercept[Jbig2.Jbig2Exception] {
      Jbig2.decodeEmbedded(Array.emptyByteArray, symDict)
    }
    assert(e2.getMessage.contains("symbol dict"))
    // SDHUFF=1 is now SUPPORTED (round 6); the declared boundary moved
    // to the reserved table selectors (DH selector 2) and to custom
    // selectors with no table segment in scope
    val e3 = intercept[Jbig2.Jbig2Exception] {
      Jbig2.decodeSymbolDict(Array[Byte](0, 9, 0, 0, 0, 0, 0, 0, 0, 0))
    }
    assert(e3.getMessage.contains("reserved DH"))
    val e3b = intercept[Jbig2.Jbig2Exception] {
      // DH selector 3 (custom) with an empty table list
      Jbig2.decodeSymbolDict(Array[Byte](0, 0x0D, 0, 0, 0, 0, 0, 0, 0, 0))
    }
    assert(e3b.getMessage.contains("missing custom table"))
    // MULTI-dictionary text streams must be the declared error, never a
    // silent SBSYMCODELEN desynchronization (referred-to wiring untracked)
    val syms1 = Vector(bitmap(3, 2)((x, y) => (x + y) % 2 == 0))
    val one = Jbig2.buildEmbeddedText(16, 8, syms1, Seq(Jbig2.TextInstance(0, 1, 1)))
    val dictSeg = {
      // extract the symbol-dict segment (number 2) from the built stream
      val segs = Jbig2.parseSegments(one)
      segs.find(_.segType == 0).get
    }
    // splice a second dictionary ahead of the original stream
    val extra = new scala.collection.mutable.ArrayBuffer[Byte]()
    extra ++= Array[Byte](0, 0, 0, 9, 0, 0, 1)
    extra ++= Array[Byte](
      ((dictSeg.data.length >>> 24) & 0xff).toByte, ((dictSeg.data.length >>> 16) & 0xff).toByte,
      ((dictSeg.data.length >>> 8) & 0xff).toByte, (dictSeg.data.length & 0xff).toByte)
    extra ++= dictSeg.data
    val e4 = intercept[Jbig2.Jbig2Exception] {
      Jbig2.decodeEmbedded(extra.toArray, one)
    }
    assert(e4.getMessage.contains("multi-dictionary"))
    // and through the PDF face it is fail-soft: document still parses,
    // the bad image yields no output instead of an exception
    val good = PdfBuilder.withJbig2ImagePattern(4, 4, (_, _) => false)
    assert(PdfImages.documentImages("ok", good).size == 1)
  }
}
