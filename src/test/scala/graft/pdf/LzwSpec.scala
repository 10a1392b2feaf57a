package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** LZWDecode (§7.4.4): hand-derived code-stream pin, round-trip
  * against an independent test-side encoder (incl. code-width growth
  * and the earlyChange variants), KwKwK case, decode-chain dispatch
  * with predictor params.
  */
class LzwSpec extends AnyFunSuite {

  /** Minimal test-side LZW encoder mirroring §7.4.4 (MSB-first,
    * leading ClearTable, EOD, early width change like the decoder). */
  private def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = mutable.HashMap.empty[Seq[Byte], Int]
    (0 until 256).foreach(b => dict(Seq(b.toByte)) = b)
    var nextCode = 258
    emit(256) // ClearTable
    var prev = Vector.empty[Byte]
    data.foreach { b =>
      val cur = prev :+ b
      if (dict.contains(cur)) prev = cur
      else {
        emit(dict(prev))
        if (nextCode < 4096) {
          dict(cur) = nextCode; nextCode += 1
          // the DECODER's table lags the encoder's by one entry at read
          // time, so the encoder bumps one step later than the
          // decoder's (dictSize + earlyChange >= 2^w) rule
          if (width < 12 && nextCode + earlyChange >= (1 << width) + 1) width += 1
        }
        prev = Vector(b)
      }
    }
    if (prev.nonEmpty) emit(dict(prev))
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private def pack9(codes: Seq[Int]): Array[Byte] = {
    var bitBuf = 0L; var bitCnt = 0
    val out = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      bitBuf = (bitBuf << 9) | c; bitCnt += 9
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("hand-derived stream: ABABABA = [Clear, A, B, 258, 260(KwKwK), EOD]") {
    // encoder trace: emit A, add AB=258; emit B, add BA=259; AB in dict;
    // emit 258, add ABA=260; AB->ABA in dict; end: emit 260
    val bytes = pack9(Seq(256, 65, 66, 258, 260, 257))
    assert(new String(Filters.lzwDecode(bytes), "US-ASCII") == "ABABABA")
  }

  test("round-trip: text, binary, and width-growth inputs (earlyChange 0 and 1)") {
    val cases = Seq[Array[Byte]](
      "".getBytes,
      "A".getBytes,
      "to be or not to be that is the question to be or not".getBytes,
      Array.tabulate[Byte](5000)(i => ((i * i) % 7).toByte), // few symbols, many entries
      Array.tabulate[Byte](9000)(i => ((i * 31 + i / 7) % 251).toByte)) // width growth past 511/1023
    for (data <- cases; early <- Seq(0, 1)) {
      val enc = lzwEncode(data, early)
      assert(Filters.lzwDecode(enc, early).toSeq == data.toSeq,
        s"round-trip failed (early=$early, n=${data.length})")
    }
  }

  test("decode chain dispatches LZWDecode with EarlyChange + predictor params") {
    val row = Array[Byte](1, 2, 3, 4)
    // PNG Up predictor row pair: filter byte 2 rows of 4 cols
    val pred = Array[Byte](0, 1, 2, 3, 4, 2, 1, 1, 1, 1) // row2 = row1 + (1,1,1,1)
    val dict = PDict(Map(
      "Filter" -> PName("LZWDecode"),
      "DecodeParms" -> PDict(Map(
        "EarlyChange" -> PInt(1), "Predictor" -> PInt(12),
        "Colors" -> PInt(1), "BitsPerComponent" -> PInt(8), "Columns" -> PInt(4)))))
    val decoded = Filters.decode(dict, lzwEncode(pred), identity)
    assert(decoded.map(_.toSeq) == Right(row.toSeq ++ Seq[Byte](2, 3, 4, 5)))
  }

  test("garbage input is fail-soft: PdfParseException or truncation, never a crash/hang") {
    val junk = Array.tabulate[Byte](64)(i => (i * 97).toByte)
    try { Filters.lzwDecode(junk); () }
    catch { case _: PdfParseException => () }
  }
}
