package graft.pdf

/** CCITT Group 4 (ITU-T T.6, pure 2-D/MMR) fax decoder — the
  * `/CCITTFaxDecode` filter with `K < 0`, the variant scanned-PDF
  * image XObjects actually use (ISO 32000-1 §7.4.6).
  *
  * The reference fail-soft-skips this filter entirely
  * (/root/reference/extractor/src/engine/mod.rs:163 "Unsupported
  * filter"); we EXTEND deliberately, like the raw-/ColorSpace branch
  * in [[PdfImages]]. Correctness is cross-validated against an
  * INDEPENDENT codec: CcittFaxSpec encodes random bilevel images with
  * the JDK's TIFF CCITT T.6 writer and this decoder must reproduce
  * the exact pixels from the raw strip bytes (plus hand-pinned tiny
  * bitstreams).
  *
  * Algorithm (T.6 §2.2): every line is coded against the line above
  * (first reference line = all white) via vertical (a1 = b1 ± 0..3),
  * horizontal (two T.4 MH run lengths) and pass modes; run lengths
  * use the standard white/black terminating + makeup code tables with
  * the shared extended makeups. Bits are MSB-first (FillOrder 1, the
  * PDF default).
  */
object CcittFax {

  final class CcittException(msg: String) extends RuntimeException(msg)

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0 // bit position
    def bitsLeft: Int = data.length * 8 - pos
    def read(): Int = {
      if (pos >= data.length * 8) throw new CcittException("CCITT: out of data")
      val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    /** Peek up to n bits without consuming (right-aligned); short data
      * pads with zeros (EOFB region reads as zeros). */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val bit = if (p >= data.length * 8) 0 else (data(p >> 3) >> (7 - (p & 7))) & 1
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
    def alignToByte(): Unit = pos = (pos + 7) & ~7
  }

  // ---- T.4 modified-Huffman run-length tables --------------------------
  // (code string, run). Decoded via a (length, bits) map; makeup codes
  // (run >= 64) must be followed by more codes until a terminating
  // (< 64) run completes the total.

  private val whiteCodes: Seq[(String, Int)] = Seq(
    "00110101" -> 0, "000111" -> 1, "0111" -> 2, "1000" -> 3, "1011" -> 4,
    "1100" -> 5, "1110" -> 6, "1111" -> 7, "10011" -> 8, "10100" -> 9,
    "00111" -> 10, "01000" -> 11, "001000" -> 12, "000011" -> 13,
    "110100" -> 14, "110101" -> 15, "101010" -> 16, "101011" -> 17,
    "0100111" -> 18, "0001100" -> 19, "0001000" -> 20, "0010111" -> 21,
    "0000011" -> 22, "0000100" -> 23, "0101000" -> 24, "0101011" -> 25,
    "0010011" -> 26, "0100100" -> 27, "0011000" -> 28, "00000010" -> 29,
    "00000011" -> 30, "00011010" -> 31, "00011011" -> 32, "00010010" -> 33,
    "00010011" -> 34, "00010100" -> 35, "00010101" -> 36, "00010110" -> 37,
    "00010111" -> 38, "00101000" -> 39, "00101001" -> 40, "00101010" -> 41,
    "00101011" -> 42, "00101100" -> 43, "00101101" -> 44, "00000100" -> 45,
    "00000101" -> 46, "00001010" -> 47, "00001011" -> 48, "01010010" -> 49,
    "01010011" -> 50, "01010100" -> 51, "01010101" -> 52, "00100100" -> 53,
    "00100101" -> 54, "01011000" -> 55, "01011001" -> 56, "01011010" -> 57,
    "01011011" -> 58, "01001010" -> 59, "01001011" -> 60, "00110010" -> 61,
    "00110011" -> 62, "00110100" -> 63,
    // white makeup
    "11011" -> 64, "10010" -> 128, "010111" -> 192, "0110111" -> 256,
    "00110110" -> 320, "00110111" -> 384, "01100100" -> 448,
    "01100101" -> 512, "01101000" -> 576, "01100111" -> 640,
    "011001100" -> 704, "011001101" -> 768, "011010010" -> 832,
    "011010011" -> 896, "011010100" -> 960, "011010101" -> 1024,
    "011010110" -> 1088, "011010111" -> 1152, "011011000" -> 1216,
    "011011001" -> 1280, "011011010" -> 1344, "011011011" -> 1408,
    "010011000" -> 1472, "010011001" -> 1536, "010011010" -> 1600,
    "011000" -> 1664, "010011011" -> 1728)

  private val blackCodes: Seq[(String, Int)] = Seq(
    "0000110111" -> 0, "010" -> 1, "11" -> 2, "10" -> 3, "011" -> 4,
    "0011" -> 5, "0010" -> 6, "00011" -> 7, "000101" -> 8, "000100" -> 9,
    "0000100" -> 10, "0000101" -> 11, "0000111" -> 12, "00000100" -> 13,
    "00000111" -> 14, "000011000" -> 15, "0000010111" -> 16,
    "0000011000" -> 17, "0000001000" -> 18, "00001100111" -> 19,
    "00001101000" -> 20, "00001101100" -> 21, "00000110111" -> 22,
    "00000101000" -> 23, "00000010111" -> 24, "00000011000" -> 25,
    "000011001010" -> 26, "000011001011" -> 27, "000011001100" -> 28,
    "000011001101" -> 29, "000001101000" -> 30, "000001101001" -> 31,
    "000001101010" -> 32, "000001101011" -> 33, "000011010010" -> 34,
    "000011010011" -> 35, "000011010100" -> 36, "000011010101" -> 37,
    "000011010110" -> 38, "000011010111" -> 39, "000001101100" -> 40,
    "000001101101" -> 41, "000011011010" -> 42, "000011011011" -> 43,
    "000001010100" -> 44, "000001010101" -> 45, "000001010110" -> 46,
    "000001010111" -> 47, "000001100100" -> 48, "000001100101" -> 49,
    "000001010010" -> 50, "000001010011" -> 51, "000000100100" -> 52,
    "000000110111" -> 53, "000000111000" -> 54, "000000100111" -> 55,
    "000000101000" -> 56, "000001011000" -> 57, "000001011001" -> 58,
    "000000101011" -> 59, "000000101100" -> 60, "000001011010" -> 61,
    "000001100110" -> 62, "000001100111" -> 63,
    // black makeup
    "0000001111" -> 64, "000011001000" -> 128, "000011001001" -> 192,
    "000001011011" -> 256, "000000110011" -> 320, "000000110100" -> 384,
    "000000110101" -> 448, "0000001101100" -> 512, "0000001101101" -> 576,
    "0000001001010" -> 640, "0000001001011" -> 704, "0000001001100" -> 768,
    "0000001001101" -> 832, "0000001110010" -> 896, "0000001110011" -> 960,
    "0000001110100" -> 1024, "0000001110101" -> 1088,
    "0000001110110" -> 1152, "0000001110111" -> 1216,
    "0000001010010" -> 1280, "0000001010011" -> 1344,
    "0000001010100" -> 1408, "0000001010101" -> 1472,
    "0000001011010" -> 1536, "0000001011011" -> 1600,
    "0000001100100" -> 1664, "0000001100101" -> 1728)

  /** Extended makeups 1792-2560, shared by both colors (T.4 table 3). */
  private val commonMakeup: Seq[(String, Int)] = Seq(
    "00000001000" -> 1792, "00000001100" -> 1856, "00000001101" -> 1920,
    "000000010010" -> 1984, "000000010011" -> 2048, "000000010100" -> 2112,
    "000000010101" -> 2176, "000000010110" -> 2240, "000000010111" -> 2304,
    "000000011100" -> 2368, "000000011101" -> 2432, "000000011110" -> 2496,
    "000000011111" -> 2560)

  /** Prefix-decode tables: the next 13 bits (max code length) index
    * directly to `(len << 16 | run) + 1`, 0 = invalid — the codes are
    * prefix-free, so every 13-bit window containing a valid code as a
    * prefix resolves uniquely. One array read per decoded code instead
    * of per-length map probes: the hot path of a scanned corpus is
    * millions of runs per document batch. */
  private def buildTable(codes: Seq[(String, Int)]): Array[Int] = {
    val t = new Array[Int](1 << 13)
    codes.foreach { case (s, run) =>
      val len = s.length
      val prefix = Integer.parseInt(s, 2) << (13 - len)
      var i = 0
      while (i < (1 << (13 - len))) { t(prefix | i) = ((len << 16) | run) + 1; i += 1 }
    }
    t
  }
  private val whiteTable = buildTable(whiteCodes ++ commonMakeup)
  private val blackTable = buildTable(blackCodes ++ commonMakeup)

  /** One MH-coded TOTAL run length (makeups + final terminating). */
  private def readRun(br: BitReader, white: Boolean): Int = {
    val table = if (white) whiteTable else blackTable
    var total = 0
    var terminating = false
    while (!terminating) {
      val e = table(br.peek(13))
      if (e == 0)
        throw new CcittException(s"CCITT: bad ${if (white) "white" else "black"} run code")
      val len = (e - 1) >>> 16
      val run = (e - 1) & 0xffff
      br.skip(len)
      total += run
      terminating = run < 64
    }
    total
  }

  /** One 2-D-coded line (the T.6 line coder, also T.4's 2-D lines)
    * against reference transitions `ref`; transitions land in `cur`,
    * returns their count. */
  private def decode2DLine(br: BitReader, ref: Array[Int], cur: Array[Int],
      columns: Int, row: Int): Int = {
    var nCur = 0
    var a0 = -1
    var white = true
    while (a0 < columns) {
      // zero-length runs (legal codes: white 0 / black 0) and VL modes
      // can append transitions without advancing a0 — a crafted stream
      // of them must hit this declared failure, not overflow `cur`
      // (sized columns+4) with a raw ArrayIndexOutOfBoundsException
      if (nCur + 2 > cur.length)
        throw new CcittException(s"CCITT: transition overflow at row $row")
      // b1: first ref transition > a0 changing AWAY from our color
      // (white run -> need a white->black change = even index)
      var i = 0
      while (ref(i) <= a0) i += 1
      if ((i % 2 == 0) != white) i += 1
      val b1 = if (i < ref.length) ref(i) else columns
      val b2 = if (i + 1 < ref.length) ref(i + 1) else columns

      val p7 = br.peek(7)
      if ((p7 >> 6) == 1) { // 1xxxxxx: V0
        br.skip(1)
        cur(nCur) = b1; nCur += 1
        a0 = b1; white = !white
      } else if ((p7 >> 4) == 3) { // 011: VR1
        br.skip(3)
        cur(nCur) = math.min(b1 + 1, columns); nCur += 1
        a0 = b1 + 1; white = !white
      } else if ((p7 >> 4) == 2) { // 010: VL1
        br.skip(3)
        cur(nCur) = math.max(b1 - 1, 0); nCur += 1
        a0 = b1 - 1; white = !white
      } else if ((p7 >> 4) == 1) { // 001: horizontal
        br.skip(3)
        val s = math.max(a0, 0)
        val r1 = readRun(br, white)
        val r2 = readRun(br, !white)
        cur(nCur) = math.min(s + r1, columns); nCur += 1
        cur(nCur) = math.min(s + r1 + r2, columns); nCur += 1
        a0 = s + r1 + r2 // color unchanged: two full runs consumed
      } else if ((p7 >> 3) == 1) { // 0001: pass
        br.skip(4)
        a0 = b2 // run continues through b2, no transition recorded
      } else if ((p7 >> 1) == 3) { // 000011: VR2
        br.skip(6)
        cur(nCur) = math.min(b1 + 2, columns); nCur += 1
        a0 = b1 + 2; white = !white
      } else if ((p7 >> 1) == 2) { // 000010: VL2
        br.skip(6)
        cur(nCur) = math.max(b1 - 2, 0); nCur += 1
        a0 = b1 - 2; white = !white
      } else if (p7 == 3) { // 0000011: VR3
        br.skip(7)
        cur(nCur) = math.min(b1 + 3, columns); nCur += 1
        a0 = b1 + 3; white = !white
      } else if (p7 == 2) { // 0000010: VL3
        br.skip(7)
        cur(nCur) = math.max(b1 - 3, 0); nCur += 1
        a0 = b1 - 3; white = !white
      } else {
        // 0000000x: EOFB/EOL region mid-line = truncated data
        throw new CcittException(s"CCITT: unexpected EOL/EOFB at row $row")
      }
    }
    nCur
  }

  /** One 1-D MH-coded line (alternating white/black run lengths,
    * starting white); transitions land in `cur`, returns their count. */
  private def decode1DLine(br: BitReader, cur: Array[Int], columns: Int): Int = {
    var nCur = 0
    var x = 0
    var white = true
    while (x < columns) {
      // zero-length runs are legal codes but append without advancing
      // x; bound them to the buffer (columns+4) with a declared error
      if (nCur >= cur.length)
        throw new CcittException("CCITT: transition overflow in 1-D line")
      x += readRun(br, white)
      cur(nCur) = math.min(x, columns); nCur += 1
      white = !white
    }
    nCur
  }

  private def renderRow(out: Array[Byte], row: Int, columns: Int,
      cur: Array[Int], nCur: Int, whiteByte: Byte, blackByte: Byte): Unit = {
    var x = 0
    var c = whiteByte
    var t = 0
    while (x < columns) {
      val next = if (t < nCur) math.min(cur(t), columns) else columns
      java.util.Arrays.fill(out, row * columns + x, row * columns + next, c)
      x = next
      c = if (c == whiteByte) blackByte else whiteByte
      t += 1
    }
  }

  private def withSentinels(cur: Array[Int], nCur: Int, columns: Int): Array[Int] = {
    val ref = java.util.Arrays.copyOf(cur, nCur + 4)
    java.util.Arrays.fill(ref, nCur, nCur + 4, columns)
    ref
  }

  /** Decode a K<0 (pure T.6) stream to one gray byte per pixel:
    * CCITT-black → 0x00, white → 0xff (flip with `blackIs1 = true`,
    * the /DecodeParms bit-convention toggle). */
  def decodeG4(data: Array[Byte], columns: Int, rows: Int,
      blackIs1: Boolean = false): Array[Byte] = {
    require(columns > 0 && rows > 0, "CCITT dims")
    val br = new BitReader(data)
    val out = new Array[Byte](columns * rows)
    val blackByte: Byte = if (blackIs1) -1 else 0
    val whiteByte: Byte = if (blackIs1) 0 else -1
    // reference/current transition position arrays (color changes at
    // ascending positions; even index = white->black since a line
    // starts white), padded with `columns` sentinels
    var ref = Array(columns, columns, columns, columns)
    val cur = new Array[Int](columns + 4)
    var row = 0
    while (row < rows) {
      val nCur = decode2DLine(br, ref, cur, columns, row)
      renderRow(out, row, columns, cur, nCur, whiteByte, blackByte)
      ref = withSentinels(cur, nCur, columns)
      row += 1
    }
    out
  }

  /** Decode a K>=0 Group 3 stream (ITU-T T.4): `twoD = false` is pure
    * 1-D MH (PDF `K = 0`); `twoD = true` is the mixed mode (PDF
    * `K > 0`, ≡ TIFF compression 3 with the 2-D T4Option): every line
    * is preceded by an EOL whose trailing tag bit says whether the
    * line is 1-D or 2-D-coded against the previous line. EOL markers
    * and fill zeros are tolerated (and for 1-D, optional — PDF's
    * default `/EndOfLine false` emits none); `byteAlign` ≡ PDF
    * `/EncodedByteAlign` (and TIFF "CCITT RLE" row alignment). */
  def decodeG3(data: Array[Byte], columns: Int, rows: Int,
      blackIs1: Boolean = false, twoD: Boolean = false,
      byteAlign: Boolean = false): Array[Byte] = {
    require(columns > 0 && rows > 0, "CCITT dims")
    val br = new BitReader(data)
    val out = new Array[Byte](columns * rows)
    val blackByte: Byte = if (blackIs1) -1 else 0
    val whiteByte: Byte = if (blackIs1) 0 else -1
    var ref = Array(columns, columns, columns, columns)
    val cur = new Array[Int](columns + 4)
    var row = 0
    while (row < rows) {
      if (byteAlign) br.alignToByte()
      // consume fill zeros + EOL(s); remember the tag bit after the
      // last EOL in 2-D mode (1 = 1-D line, 0 = 2-D line)
      var oneD = !twoD
      var sawEol = false
      var scanning = true
      while (scanning) {
        if (br.bitsLeft >= 12 && br.peek(12) == 1) {
          br.skip(12); sawEol = true
          if (twoD) {
            if (br.bitsLeft < 1) throw new CcittException("CCITT: EOL tag truncated")
            oneD = br.read() == 1
          }
        } else if (br.bitsLeft >= 12 && br.peek(12) == 0) {
          br.skip(1) // fill zero before an EOL
        } else scanning = false
      }
      if (twoD && !sawEol)
        throw new CcittException(s"CCITT: missing EOL before 2-D-mode row $row")
      val nCur =
        if (oneD) decode1DLine(br, cur, columns)
        else decode2DLine(br, ref, cur, columns, row)
      renderRow(out, row, columns, cur, nCur, whiteByte, blackByte)
      ref = withSentinels(cur, nCur, columns)
      row += 1
    }
    out
  }
}
