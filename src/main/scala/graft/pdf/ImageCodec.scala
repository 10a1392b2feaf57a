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
