package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input smoke for the round-6 binary parsers: random and
  * mutated-valid bytes must produce a None or the DECLARED exception
  * type — never an uncontrolled error (OOM-scale allocation, infinite
  * loop, ArrayIndexOutOfBounds escaping the fail-soft contract). */
class ParserFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)
  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  test("Wav.decode: random and mutated-valid input → Some or None, never a throw") {
    (0 until 400).foreach { i =>
      Wav.decode(randomBytes(rnd.nextInt(200))) // must not throw
      val valid = Wav.encodePcm16(8000, 1, Array.tabulate(16)(_.toShort))
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Wav.decode(mut)
      Wav.decode(valid.take(rnd.nextInt(valid.length)))
    }
  }

  test("Mp4Demux.demux: random and mutated-valid input → Some or None, never a throw; samples stay in-bounds") {
    // the in-bounds invariant is what keeps the consumer's
    // copyOfRange(bytes, offset.toInt, ...) total: every returned
    // sample must address real file bytes (no EOF overrun, no >2^31
    // offset a .toInt would truncate)
    def inBounds(bytes: Array[Byte]): Unit =
      Mp4Demux.demux(bytes).foreach(_.samples.foreach { s =>
        assert(s.offset >= 0L && s.size >= 0L &&
          s.offset + s.size <= bytes.length.toLong,
          s"sample out of bounds: off=${s.offset} size=${s.size} len=${bytes.length}")
      })
    val valid = Mp4Demux.buildFixture((0 until 4).map(j => s"s$j".getBytes))
    (0 until 400).foreach { i =>
      inBounds(randomBytes(rnd.nextInt(200)))
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      inBounds(mut)
      inBounds(valid.take(rnd.nextInt(valid.length)))
    }
  }

  test("JBIG2 Huffman parsers: random/mutated input → result or Jbig2Exception only") {
    import graft.pdf.Jbig2
    def only[T](body: => T): Unit =
      try { body; () } catch { case _: Jbig2.Jbig2Exception => () }
    val dictValid = Jbig2.encodeSymbolDictHuff(Vector(
      graft.pdf.Jbig2.Bitmap(3, 2, Array[Byte](1, 0, 1, 0, 1, 0))))
    val tabValid = Jbig2.fixtureDsTable
    (0 until 300).foreach { i =>
      only(Jbig2.parseTableSegment(randomBytes(12 + rnd.nextInt(40))))
      only(Jbig2.decodeSymbolDict(randomBytes(10 + rnd.nextInt(60))))
      val mutD = dictValid.clone()
      mutD(rnd.nextInt(mutD.length)) = rnd.nextInt(256).toByte
      only(Jbig2.decodeSymbolDict(mutD))
      val mutT = tabValid.clone()
      mutT(rnd.nextInt(mutT.length)) = rnd.nextInt(256).toByte
      only(Jbig2.parseTableSegment(mutT))
    }
  }
}
