package graft.pdf

import java.awt.image.BufferedImage
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import org.scalatest.funsuite.AnyFunSuite

/** CCITT G4 decoder cross-validated against an INDEPENDENT codec: the
  * JDK's TIFF writer compresses bilevel images with CCITT T.6, a
  * minimal IFD parser pulls the raw strips back out, and
  * [[CcittFax.decodeG4]] must reproduce the exact pixels. A wrong
  * entry anywhere in the run-length tables or mode logic shows up as
  * a pixel diff (the 2600-wide sweep exercises the long makeup
  * codes). */
class CcittFaxSpec extends AnyFunSuite {

  System.setProperty("java.awt.headless", "true")

  /** (width, height, strips as (bytes, rowsInStrip)). */
  private def t6Strips(img: BufferedImage): (Int, Int, Vector[(Array[Byte], Int)]) =
    ccittStrips(img, "CCITT T.6", 4)

  private def ccittStrips(img: BufferedImage, typ: String,
      expectCompression: Int): (Int, Int, Vector[(Array[Byte], Int)]) = {
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(typ)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    // ONE shared strip walker (ImageCodec.tiffStrips) for fixture
    // encoder and spec — no second hand-rolled IFD parser to drift
    val t = ImageCodec.tiffStrips(bos.toByteArray)
    assert(t.compression == expectCompression, s"expected $expectCompression, got ${t.compression}")
    assert(t.fillOrder == 1, "MSB fill order expected")
    (t.width, t.height, t.strips)
  }

  /** Decode the TIFF's T.6 strips with OUR decoder and compare every
    * pixel against the source image. */
  private def crossCheck(img: BufferedImage): Unit = {
    val (w, h, strips) = t6Strips(img)
    assert(w == img.getWidth && h == img.getHeight)
    var y0 = 0
    strips.foreach { case (bytes, rows) =>
      val gray = CcittFax.decodeG4(bytes, w, rows)
      (0 until rows).foreach { dy =>
        (0 until w).foreach { x =>
          val mine = (gray(dy * w + x) & 0xff) == 0xff // white
          val src = (img.getRGB(x, y0 + dy) & 0xffffff) == 0xffffff
          assert(mine == src, s"pixel ($x, ${y0 + dy}) mismatch")
        }
      }
      y0 += rows
    }
  }

  private def bilevel(w: Int, h: Int)(white: (Int, Int) => Boolean): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, if (white(x, y)) 0xffffff else 0)))
    img
  }

  test("G4 decode matches the JDK codec: structured patterns (all modes)") {
    crossCheck(bilevel(16, 8)((x, y) => (x / 3 + y) % 2 == 0)) // diagonal stripes: V modes
    crossCheck(bilevel(40, 12)((_, _) => true)) // all white
    crossCheck(bilevel(40, 12)((_, _) => false)) // all black
    crossCheck(bilevel(33, 9)((x, y) => x == y * 3)) // isolated pixels: H modes
    crossCheck(bilevel(64, 16)((x, y) => (x ^ y) % 5 < 2)) // busy texture: pass modes
  }

  test("G4 decode matches the JDK codec: seeded random bitmaps") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      crossCheck(bilevel(57 + seed * 13, 21)((_, _) => rnd.nextInt(3) > 0))
    }
  }

  test("G4 decode matches the JDK codec: 2600-wide run sweep (long makeup codes)") {
    // rows of random-length runs spanning the full makeup range, plus
    // near-full-width runs that force 2560-class makeups
    val w = 2600
    val rnd = new scala.util.Random(7)
    val rows = Vector(
      Vector(2590, 10), // 2560-makeup white run
      Vector(3, 2565, 32), // 2560-class black run
      Vector.fill(40)(1 + rnd.nextInt(130)), // mixed short/medium runs
      Vector(1300, 1300), // exact halves
      Vector.fill(8)(325)) // repeated medium runs
    val img = new BufferedImage(w, rows.length, BufferedImage.TYPE_BYTE_BINARY)
    rows.zipWithIndex.foreach { case (runs, y) =>
      var x = 0; var white = true
      runs.foreach { r =>
        (0 until r).foreach { i =>
          if (x + i < w) img.setRGB(x + i, y, if (white) 0xffffff else 0)
        }
        x += r; white = !white
      }
      while (x < w) { img.setRGB(x, y, if (white) 0xffffff else 0); x += 1 }
    }
    crossCheck(img)
  }

  private def crossCheckG3(img: BufferedImage, typ: String, comp: Int,
      twoD: Boolean, byteAlign: Boolean): Unit = {
    val (w, h, strips) = ccittStrips(img, typ, comp)
    assert(w == img.getWidth && h == img.getHeight)
    var y0 = 0
    strips.foreach { case (bytes, rows) =>
      val gray = CcittFax.decodeG3(bytes, w, rows, twoD = twoD, byteAlign = byteAlign)
      (0 until rows).foreach { dy =>
        (0 until w).foreach { x =>
          val mine = (gray(dy * w + x) & 0xff) == 0xff
          val src = (img.getRGB(x, y0 + dy) & 0xffffff) == 0xffffff
          assert(mine == src, s"pixel ($x, ${y0 + dy}) mismatch ($typ)")
        }
      }
      y0 += rows
    }
  }

  test("G3 1-D decode matches the JDK codec (CCITT RLE: byte-aligned MH rows, K=0 shape)") {
    crossCheckG3(bilevel(16, 8)((x, y) => (x / 3 + y) % 2 == 0), "CCITT RLE", 2,
      twoD = false, byteAlign = true)
    crossCheckG3(bilevel(40, 10)((_, _) => false), "CCITT RLE", 2,
      twoD = false, byteAlign = true)
    val rnd = new scala.util.Random(9)
    crossCheckG3(bilevel(73, 19)((_, _) => rnd.nextInt(3) > 0), "CCITT RLE", 2,
      twoD = false, byteAlign = true)
  }

  test("G3 2-D mixed decode matches the JDK codec (CCITT T.4 with EOL+tag lines, K>0 shape)") {
    crossCheckG3(bilevel(16, 8)((x, y) => (x / 3 + y) % 2 == 0), "CCITT T.4", 3,
      twoD = true, byteAlign = false)
    crossCheckG3(bilevel(64, 16)((x, y) => (x ^ y) % 5 < 2), "CCITT T.4", 3,
      twoD = true, byteAlign = false)
    val rnd = new scala.util.Random(11)
    crossCheckG3(bilevel(91, 23)((_, _) => rnd.nextInt(4) > 1), "CCITT T.4", 3,
      twoD = true, byteAlign = false)
  }

  test("hand pin: tiny known bitstream decodes deterministically") {
    // decode-twice determinism + fail-soft on garbage
    val img = bilevel(8, 4)((x, _) => x < 4)
    val (_, _, strips) = t6Strips(img)
    val a = CcittFax.decodeG4(strips.head._1, 8, strips.head._2)
    val b = CcittFax.decodeG4(strips.head._1, 8, strips.head._2)
    assert(a.toSeq == b.toSeq)
    intercept[CcittFax.CcittException] {
      CcittFax.decodeG4(Array[Byte](0, 0, 0, 0), 16, 4)
    }
  }

  test("zero-length-run flood raises CcittException, not ArrayIndexOutOfBounds") {
    // white-0 ("00110101") and black-0 ("0000110111") are legal
    // terminating codes that append a transition WITHOUT advancing x;
    // a crafted alternating flood must hit the declared bounds error,
    // not overflow the transition buffer (sized columns+4) raw
    val bits = new StringBuilder
    for (_ <- 0 until 40) bits.append("00110101").append("0000110111")
    val padded = bits.toString.padTo((bits.length + 7) / 8 * 8, '0')
    val data = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val e = intercept[CcittFax.CcittException] {
      CcittFax.decodeG3(data, columns = 8, rows = 2)
    }
    assert(e.getMessage.contains("transition overflow"))
    // same flood through the 2-D horizontal mode (001 + two runs)
    val bits2 = new StringBuilder
    for (_ <- 0 until 40) bits2.append("001").append("00110101").append("0000110111")
    val padded2 = bits2.toString.padTo((bits2.length + 7) / 8 * 8, '0')
    val data2 = padded2.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val e2 = intercept[CcittFax.CcittException] {
      CcittFax.decodeG4(data2, columns = 8, rows = 2)
    }
    assert(e2.getMessage.contains("transition overflow"))
  }
}
