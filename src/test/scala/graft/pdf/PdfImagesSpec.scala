package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.InterleavedGen

/** Embedded-image extraction + PNG materialization (reference
  * save_pdf_image, engine/mod.rs:138-211): decode classes, the
  * Flate-only rotate90 quirk, the name formula, and the codec-free
  * PNG encoder (verified by parsing our own output's IHDR and by
  * construction of the zlib scanlines).
  */
class PdfImagesSpec extends AnyFunSuite {

  private def images(text: String = "img doc") =
    PdfImages.documentImages("docX", PdfBuilder.withImages(text))

  test("withImages doc: 4 images, reference name formula, stable order") {
    val ims = images()
    assert(ims.map(_.name) ==
      Vector("docX_1_0.png", "docX_1_1.png", "docX_1_2.png", "docX_1_3.png"))
  }

  test("DCTDecode: REAL JPEG decode -> RGBA -> PNG, dims from the decoded image, no rotation") {
    val im = images()(0)
    assert(im.format == "png" && im.width == 8 && im.height == 8)
    val Some((w, h, rgba)) = PdfImages.decodePng(im.bytes)
    assert((w, h) == (8, 8))
    // JPEG is lossy: decoded pixels must be NEAR the encoded pattern
    // (channel-wise |err| small for this smooth gradient), alpha 255
    val src = PdfBuilder.jpegPatternRgb
    var maxErr = 0
    for (i <- 0 until 64) {
      for (c <- 0 until 3)
        maxErr = math.max(maxErr, math.abs((rgba(i * 4 + c) & 0xff) - (src(i * 3 + c) & 0xff)))
      assert((rgba(i * 4 + 3) & 0xff) == 255)
    }
    assert(maxErr <= 48, s"JPEG decode drifted too far from the source pattern: $maxErr")
  }

  test("Flate-wrapped PNG container: guessed-format decode + rotate90 (the reference's branch)") {
    val im = images()(3)
    // source container is 2x3; the Flate branch rotates 90° clockwise
    assert(im.format == "png" && im.width == 3 && im.height == 2)
    val Some((w, h, rgba)) = PdfImages.decodePng(im.bytes)
    assert((w, h) == (3, 2))
    // PNG is lossless: output pixels == rotate90 of the exact source
    val expected = PdfImages.rotate90(PdfBuilder.pngPatternRgba, 2, 3)
    assert(rgba.toSeq == expected.toSeq)
  }

  test("ImageCodec preserves the decoded image's real alpha (the reference's decode() does too)") {
    // a 2x1 RGBA PNG with alpha 128 and 255: decodeToRgba must carry
    // both through, not force 255 (JPEG-style opaque formats read back
    // as 255 naturally — getRGB reports 0xff for alpha-less models)
    val rgba = Array[Byte](10, 20, 30, -128.toByte, 40, 50, 60, -1)
    val png = PdfImages.encodePng(2, 1, rgba)
    val Some((w, h, back)) = ImageCodec.decodeToRgba(png)
    assert((w, h) == (2, 1))
    assert((back(3) & 0xff) == 128 && (back(7) & 0xff) == 255)
  }

  test("ImageCodec: deterministic JPEG encode; undecodable bytes fail soft") {
    val a = ImageCodec.encodeJpegRgb(8, 8, PdfBuilder.jpegPatternRgb)
    val b = ImageCodec.encodeJpegRgb(8, 8, PdfBuilder.jpegPatternRgb)
    assert(a.toSeq == b.toSeq)
    assert((a(0) & 0xff) == 0xff && (a(1) & 0xff) == 0xd8) // real JPEG SOI
    assert(ImageCodec.decodeToRgba("not an image".getBytes).isEmpty)
    assert(ImageCodec.decodeToRgba(Array.emptyByteArray).isEmpty)
  }

  test("decodeToRgbaBounded: a declared-50k-square PNG header is rejected BEFORE pixel decode; small images pass") {
    // craft a syntactically valid PNG signature + IHDR declaring
    // 50000x50000 (CRC32 correct so the reader accepts the header) —
    // ImageIO.read would allocate the ~10 GB frame first and die with
    // an OutOfMemoryError, which is NOT NonFatal: the bound must trip
    // on the HEADER dims
    val ihdrBody = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    ihdrBody.write("IHDR".getBytes("US-ASCII"))
    ihdrBody.write(be32(50000)); ihdrBody.write(be32(50000))
    ihdrBody.write(Array[Byte](8, 6, 0, 0, 0)) // 8-bit RGBA
    val crc = new java.util.zip.CRC32()
    crc.update(ihdrBody.toByteArray)
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ihdrBody.toByteArray ++ be32(crc.getValue.toInt)
    assert(ImageCodec.decodeToRgbaBounded(bomb).isEmpty,
      "the area cap must reject the header before any frame allocation")
    // and a genuinely small image still decodes through the bound
    val small = PdfImages.encodePng(2, 1, Array[Byte](1, 2, 3, -1, 4, 5, 6, -1))
    assert(ImageCodec.decodeToRgbaBounded(small).exists(_._1 == 2))
    assert(ImageCodec.decodeToRgbaBounded(small, maxPixels = 1).isEmpty,
      "the cap is honored exactly")
  }

  test("FlateDecode: inflated gray pixels -> rotate90 -> real PNG (the reference's quirk)") {
    val im = images()(1)
    assert(im.format == "png" && im.width == 4 && im.height == 4)
    val Some((w, h, colorType)) = PdfImages.pngMeta(im.bytes)
    assert((w, h, colorType) == (4, 4, 6)) // 8-bit RGBA like the reference's RgbaImage
  }

  test("raw DeviceGray: ColorSpace-interpreted RGBA PNG, no rotation") {
    val im = images()(2)
    assert(im.format == "png" && im.width == 2 && im.height == 2)
    assert(PdfImages.pngMeta(im.bytes).contains((2, 2, 6)))
  }

  test("rotate90 is clockwise with swapped dims (asymmetric fixture)") {
    // 2x1 row [A, B] -> 1x2 column [A; B] (left edge rotates to top)
    val a = Array[Byte](1, 2, 3, -1); val b = Array[Byte](4, 5, 6, -1)
    val rot = PdfImages.rotate90(a ++ b, 2, 1)
    assert(rot.toSeq == (a ++ b).toSeq) // dst(0,0)=A, dst(0,1)=B
    // 1x2 column [A; B] -> 2x1 row [B, A]
    val rot2 = PdfImages.rotate90(a ++ b, 1, 2)
    assert(rot2.toSeq == (b ++ a).toSeq)
  }

  test("PNG encoder round-trips through its own IHDR parser and zlib") {
    val rgba = Array.tabulate[Byte](3 * 2 * 4)(i => i.toByte)
    val png = PdfImages.encodePng(3, 2, rgba)
    assert(PdfImages.pngMeta(png).contains((3, 2, 6)))
    // IDAT inflates back to filter-0 scanlines carrying the pixels
    val idatOff = png.indexOfSlice("IDAT".getBytes("US-ASCII"))
    val len = ((png(idatOff - 4) & 0xff) << 24) | ((png(idatOff - 3) & 0xff) << 16) |
      ((png(idatOff - 2) & 0xff) << 8) | (png(idatOff - 1) & 0xff)
    val scan = Filters.inflate(png.slice(idatOff + 4, idatOff + 4 + len))
    assert(scan.length == 2 * (1 + 3 * 4))
    assert(scan(0) == 0 && scan(1 + 3 * 4) == 0) // filter byte 0 per row
    assert(scan.slice(1, 1 + 12).toSeq == rgba.slice(0, 12).toSeq)
  }

  test("PNG decode is a left inverse of encode (filter-0 RGBA)") {
    val rgba = Array.tabulate[Byte](5 * 3 * 4)(i => (i * 7).toByte)
    val png = PdfImages.encodePng(5, 3, rgba)
    assert(PdfImages.decodePng(png).map { case (w, h, p) => (w, h, p.toSeq) }
      .contains((5, 3, rgba.toSeq)))
    assert(PdfImages.decodePng("not a png".getBytes).isEmpty)
  }

  test("nearest-neighbor resize: hand-computed pixel mapping (4x4 -> 2x2 and 1x1 -> 3x3)") {
    // 4x4 gray gradient 0,16,...,240 (as in the Flate fixture): the 2x2
    // thumbnail picks sources (0,0),(2,0),(0,2),(2,2) = values 0,32,128,160
    val gray = Array.tabulate[Byte](16)(i => (i * 16).toByte)
    val rgba = new Array[Byte](16 * 4)
    (0 until 16).foreach { i =>
      rgba(i * 4) = gray(i); rgba(i * 4 + 1) = gray(i)
      rgba(i * 4 + 2) = gray(i); rgba(i * 4 + 3) = -1
    }
    val small = PdfImages.resizeRgba(rgba, 4, 4, 2, 2)
    assert(Seq(small(0), small(4), small(8 * 1), small(12)).map(_ & 0xff) ==
      Seq(0, 32, 128, 160))
    // upscale replicates the single source pixel
    val one = Array[Byte](7, 8, 9, -1)
    val up = PdfImages.resizeRgba(one, 1, 1, 3, 3)
    assert(up.grouped(4).forall(_.sameElements(one)))
  }

  test("resizePng end-to-end: every materialized image (JPEG-DCT included) is resizable") {
    val ims = images()
    ims.foreach { im =>
      val thumb = PdfImages.resizePng(im.bytes, 8, 8)
      assert(thumb.isDefined && PdfImages.pngMeta(thumb.get).contains((8, 8, 6)),
        s"${im.name} not resizable")
    }
  }

  test("determinism: same doc -> byte-identical images (retry idempotence)") {
    val a = images(); val b = images()
    assert(a.map(_.bytes.toSeq) == b.map(_.bytes.toSeq))
  }

  test("fixture style 1 docs in the corpus carry images; others none") {
    // i=5: i%10=5 in 4..8, i%4=1 -> withImages
    val (in5, _) = InterleavedGen.docWithGolden(5)
    val pdf5 = java.util.Base64.getDecoder.decode(in5.spans.head.text)
    assert(PdfImages.documentImages(in5.doc_id, pdf5).size == 4)
    // i=6: style 2, plain multi-page, no images
    val (in6, _) = InterleavedGen.docWithGolden(6)
    val pdf6 = java.util.Base64.getDecoder.decode(in6.spans.head.text)
    assert(PdfImages.documentImages(in6.doc_id, pdf6).isEmpty)
  }

  test("PngMetaDecoder extracts real dims from materialized PNGs") {
    val im = images()(1)
    val dec = new graft.operators.Multimodal.PngMetaDecoder("docX")
    val f = dec.decode(im.name, im.bytes)
    assert(f.format == "png" && f.width == 4 && f.height == 4 && f.phash.length == 16)
  }

  test("resizePng handles GENERAL PNGs via the JDK codec: palette and 16-bit gray inputs") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def pngOf(img: BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // palette PNG (color type 3): our minimal filter-0 RGBA decoder
    // cannot read it — the ImageIO fallback must
    val pal = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_INDEXED)
    (0 until 6).foreach(x => (0 until 4).foreach(y =>
      pal.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0xff0000)))
    val palPng = pngOf(pal)
    assert(PdfImages.decodePng(palPng).isEmpty, "minimal decoder should not claim palette PNGs")
    val palThumb = PdfImages.resizePng(palPng, 3, 2)
    assert(palThumb.isDefined)
    assert(PdfImages.pngMeta(palThumb.get).contains((3, 2, 6)))
    // 16-bit grayscale PNG: same story
    val g16 = new BufferedImage(5, 5, BufferedImage.TYPE_USHORT_GRAY)
    (0 until 5).foreach(x => (0 until 5).foreach(y =>
      g16.getRaster.setSample(x, y, 0, (x * 13 + y * 7) * 1000 % 65536)))
    val g16Png = pngOf(g16)
    assert(PdfImages.decodePng(g16Png).isEmpty)
    val g16Thumb = PdfImages.resizePng(g16Png, 2, 2)
    assert(g16Thumb.isDefined)
    assert(PdfImages.pngMeta(g16Thumb.get).contains((2, 2, 6)))
    // pixel content survives: a SOLID palette image resizes to the
    // same solid color (checked through our own decoder on the output)
    val solid = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_INDEXED)
    (0 until 4).foreach(x => (0 until 4).foreach(y => solid.setRGB(x, y, 0x0000ff)))
    val st = PdfImages.resizePng(pngOf(solid), 2, 2).get
    val (_, _, rgba) = PdfImages.decodePng(st).get
    (0 until 4).foreach { i =>
      assert((rgba(i * 4) & 0xff, rgba(i * 4 + 1) & 0xff, rgba(i * 4 + 2) & 0xff) == (0, 0, 255))
    }
  }

  test("CCITTFaxDecode (G4): real from-spec decode of a scanned-fax XObject (reference errors here)") {
    val ims = PdfImages.documentImages("faxdoc", PdfBuilder.withCcittImage())
    assert(ims.map(_.name) == Vector("faxdoc_1_0.png"))
    val im = ims.head
    assert(im.format == "png" && im.width == 10 && im.height == 6)
    val (w, h, rgba) = PdfImages.decodePng(im.bytes).get
    assert(w == 10 && h == 6)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val g = rgba((y * w + x) * 4) & 0xff
        val expectWhite = (x + 2 * y) % 4 != 0
        assert((g == 0xff) == expectWhite, s"pixel ($x,$y)")
        assert(g == 0xff || g == 0, "bilevel output")
      }
    }
  }

  test("CCITTFaxDecode K=0 (1-D MH, byte-aligned): same pixels as the G4 fixture") {
    val g4 = PdfImages.documentImages("fx", PdfBuilder.withCcittImagePattern(
      10, 6, (x, y) => (x + 2 * y) % 4 != 0, k = -1)).head
    val g3 = PdfImages.documentImages("fx", PdfBuilder.withCcittImagePattern(
      10, 6, (x, y) => (x + 2 * y) % 4 != 0, k = 0)).head
    assert(g3.width == 10 && g3.height == 6)
    assert(PdfImages.decodePng(g3.bytes).get._3.toSeq ==
      PdfImages.decodePng(g4.bytes).get._3.toSeq)
  }

  test("JPXDecode is permanently opaque BY DECISION: fail-soft, never silently wrong") {
    // Scope decision, pinned (the fax/JBIG2 extensions closed every
    // other scanned-page filter): a full JPEG 2000 wavelet codestream
    // decoder is out of scope; the reference errors on this filter too
    // (mod.rs:163-165). The document must still parse and the JPX
    // image must yield NO output — fail-soft, not a wrong decode.
    val jb = PdfBuilder.withJbig2ImagePattern(6, 4, (_, _) => true)
    assert(PdfImages.documentImages("jb", jb).size == 1)
    // same-length filter-name swap keeps every xref offset valid
    val s = new String(jb, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/Filter /JBIG2Decode", "/Filter /JPXDecode  ")
    val jpx = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfImages.documentImages("jpx", jpx).isEmpty)
  }
}
