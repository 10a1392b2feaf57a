package graft.pdf

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** JDK-built-in image codec (`javax.imageio` — JPEG/PNG/TIFF/BMP/GIF,
  * headless, no native display needed). This is what makes the
  * reference's two container-decode branches real on the JVM:
  *
  *  - DCTDecode → JPEG decode then PNG save
  *    (/root/reference/extractor/src/engine/mod.rs:142-148,
  *    `ImageReader::with_format(Jpeg).decode()`);
  *  - FlateDecode → inflate then GUESSED-container decode
  *    (mod.rs:149-162, `with_guessed_format().decode()` — ImageIO's
  *    `read` sniffs the format from the bytes the same way).
  *
  * Deterministic: the JDK's codecs are pure functions of the input
  * bytes (verified encode-twice in ImageCodecSpec).
  */
object ImageCodec {

  // executors have no display; force headless AWT before any ImageIO use
  System.setProperty("java.awt.headless", "true")

  /** Decode any ImageIO-supported container (format sniffed from the
    * bytes ≡ image-rs `with_guessed_format`) to an RGBA buffer. The
    * source's real alpha is PRESERVED (image-rs `decode()` keeps it;
    * opaque formats like JPEG read back as alpha 255 — getRGB reports
    * 0xff for alpha-less color models). None when the bytes are not a
    * recognizable image (fail-soft). */
  /** [[decodeToRgba]] with an AREA CAP enforced BEFORE pixel decode:
    * dims come from the container header via the ImageIO reader
    * (no BufferedImage allocation), so a crafted 50k×50k
    * decompression bomb is rejected up front — `ImageIO.read` would
    * allocate the full frame first, and that failure is an
    * OutOfMemoryError (NOT NonFatal: it kills the executor, not the
    * row). The corpus-facing hashers use this; the PDF image path
    * keeps [[decodeToRgba]] (its payloads already passed stream-size
    * bounds). */
  def decodeToRgbaBounded(bytes: Array[Byte],
      maxPixels: Long = 16777216L): Option[(Int, Int, Array[Byte])] = {
    val dimsOk =
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) false
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val w = r.getWidth(0).toLong
              val h = r.getHeight(0).toLong
              w > 0 && h > 0 && w * h <= maxPixels
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case scala.util.control.NonFatal(_) => false }
    if (dimsOk) decodeToRgba(bytes) else None
  }

  def decodeToRgba(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Byte](w * h * 4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y) // ARGB in sRGB
            val i = (y * w + x) * 4
            out(i) = ((p >> 16) & 0xff).toByte
            out(i + 1) = ((p >> 8) & 0xff).toByte
            out(i + 2) = (p & 0xff).toByte
            out(i + 3) = ((p >> 24) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some((w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Container sniff from magic bytes — the format label to pair with
    * [[decodeToRgba]] (which sniffs the same way internally via
    * ImageIO's reader lookup). None for unrecognized payloads. */
  def sniffFormat(bytes: Array[Byte]): Option[String] = {
    def at(i: Int) = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') Some("png")
    else if (at(0) == 0xff && at(1) == 0xd8) Some("jpeg")
    else if (at(0) == 'B' && at(1) == 'M') Some("bmp")
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') Some("gif")
    else if ((at(0) == 'I' && at(1) == 'I' && at(2) == 42) ||
      (at(0) == 'M' && at(1) == 'M' && at(3) == 42)) Some("tiff")
    else None
  }

  /** Deterministic JPEG encoding (default JDK quality) of a packed
    * RGB buffer — fixture-side only, so DCTDecode fixtures carry REAL
    * JPEG bytes instead of pseudo-payloads. */
  def encodeJpegRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeRgb("jpg", w, h, rgb)

  /** Deterministic BMP encoding of a packed RGB buffer (lossless —
    * decodes back to the exact pixels; fixture-side, like
    * [[encodeJpegRgb]]). */
  def encodeBmpRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    encodeRgb("bmp", w, h, rgb)

  /** CCITT G4 (T.6) encode of a bilevel pattern via the JDK's TIFF
    * writer, returning the RAW compressed strip bytes — fixture-side
    * only (PDF `/CCITTFaxDecode` fixtures need real G4 payloads, and
    * using the JDK as the encoder keeps our [[CcittFax]] decoder
    * cross-validated against an independent codec). Single-strip by
    * construction (small fixture sizes). */
  def encodeCcittT6Bilevel(w: Int, h: Int, white: (Int, Int) => Boolean): Array[Byte] =
    encodeCcittBilevel("CCITT T.6", w, h, white)

  /** CCITT 1-D MH (TIFF "CCITT RLE": byte-aligned rows, no EOLs — the
    * PDF `/K 0` + `/EncodedByteAlign true` payload shape). */
  def encodeCcittRleBilevel(w: Int, h: Int, white: (Int, Int) => Boolean): Array[Byte] =
    encodeCcittBilevel("CCITT RLE", w, h, white)

  private def encodeCcittBilevel(typ: String, w: Int, h: Int,
      white: (Int, Int) => Boolean): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, if (white(x, y)) 0xffffff else 0); x += 1 }
      y += 1
    }
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(typ)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    val strips = tiffStrips(bos.toByteArray).strips
    require(strips.length == 1, s"expected one CCITT strip, got ${strips.length}")
    strips.head._1
  }

  /** Parsed single-IFD TIFF: dims, compression scheme, fill order and
    * strips as (bytes, rowsInStrip). */
  final case class TiffStrips(width: Int, height: Int, compression: Int,
      fillOrder: Int, strips: Vector[(Array[Byte], Int)])

  /** Minimal first-IFD TIFF walk (both byte orders, BYTE/SHORT/LONG
    * entry types, inline or pointed values, multi-strip) — shared by
    * the CCITT fixture encoder above and the cross-validation spec so
    * there is exactly ONE hand-rolled strip extractor to keep correct. */
  private[pdf] def tiffStrips(b: Array[Byte]): TiffStrips = {
    val be = b(0) == 'M' // MM = big-endian
    def u16(o: Int) =
      if (be) ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      else ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    def u32(o: Int) =
      if (be) ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      else ((b(o + 3) & 0xff) << 24) | ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    val ifd = u32(4)
    val n = u16(ifd)
    var width = -1; var height = -1; var rowsPerStrip = Int.MaxValue
    var offs = Vector.empty[Int]; var counts = Vector.empty[Int]
    var compression = -1; var fillOrder = 1
    def values(entry: Int): Vector[Int] = {
      val typ = u16(entry + 2); val cnt = u32(entry + 4)
      val sz = typ match {
        case 1 => 1; case 3 => 2; case 4 => 4
        case other => throw new IllegalArgumentException(s"unsupported TIFF entry type $other")
      }
      val base = if (cnt * sz <= 4) entry + 8 else u32(entry + 8)
      (0 until cnt).toVector.map { i =>
        sz match { case 1 => b(base + i) & 0xff; case 2 => u16(base + i * 2); case 4 => u32(base + i * 4) }
      }
    }
    (0 until n).foreach { i =>
      val e = ifd + 2 + i * 12
      u16(e) match {
        case 256 => width = values(e).head
        case 257 => height = values(e).head
        case 259 => compression = values(e).head
        case 266 => fillOrder = values(e).head
        case 273 => offs = values(e)
        case 278 => rowsPerStrip = values(e).head
        case 279 => counts = values(e)
        case _ =>
      }
    }
    val strips = offs.zip(counts).zipWithIndex.map { case ((o, c), i) =>
      val rows = math.min(rowsPerStrip, height - i * rowsPerStrip)
      (java.util.Arrays.copyOfRange(b, o, o + c), rows)
    }
    TiffStrips(width, height, compression, fillOrder, strips)
  }

  private def encodeRgb(fmt: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "rgb buffer size")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }
}
