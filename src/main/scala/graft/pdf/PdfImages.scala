package graft.pdf

import java.util.zip.{CRC32, Deflater}

/** Embedded-image extraction + PNG materialization — the reference's
  * `save_pdf_image` (/root/reference/extractor/src/engine/mod.rs:138-211)
  * re-expressed, including its quirks:
  *
  *  - DCTDecode → JPEG-decode (the reference uses the image crate,
  *    mod.rs:142-148; here the JDK's built-in [[ImageCodec]]) and save
  *    PNG — dims from the DECODED image, no rotation;
  *  - FlateDecode → inflate, then guessed-container decode
  *    (mod.rs:152-158 `with_guessed_format().decode()` ≡ ImageIO's
  *    byte-sniffing read), then **rotate90 clockwise** — the reference
  *    rotates ONLY this branch (mod.rs:161) — then save PNG. Raw-pixel
  *    payloads (the common case in real PDFs) make the reference error
  *    out and skip; we EXTEND deliberately: when the container guess
  *    fails, raw pixels are interpreted via /ColorSpace (+ the
  *    rotate90 quirk preserved);
  *  - no filter → raw pixels by /ColorSpace, built as RGBA with alpha
  *    255 exactly like the reference's `RgbaImage` (mod.rs:169-204),
  *    no rotation, saved as PNG.
  *
  * The PNG encoder is from the spec (ISO 15948: zlib IDAT, CRC32
  * chunks, filter 0 rows, 8-bit RGBA) — deterministic, codec-free.
  */
object PdfImages {

  /** One extracted page image; always materialized as PNG, like the
    * reference (its `img.save("....png")` writes PNG on every branch). */
  final case class ImageOut(name: String, width: Int, height: Int,
      format: String, bytes: Array[Byte])

  /** Decode one image XObject stream → ImageOut, or Left to skip
    * (fail-soft, like the reference's `.is_ok()` guard, mod.rs:112). */
  def decode(doc: PdfDocument, s: PStream): Either[String, (Int, Int, String, Array[Byte])] = {
    val w = doc.dictGet(s.dict, "Width") match { case PInt(v) => v.toInt; case _ => return Left("no Width") }
    val h = doc.dictGet(s.dict, "Height") match { case PInt(v) => v.toInt; case _ => return Left("no Height") }
    val cs = doc.dictGet(s.dict, "ColorSpace") match { case PName(n) => n; case _ => "" }
    val filter = doc.dictGet(s.dict, "Filter") match {
      case PName(n) => n
      case PArr(items) if items.nonEmpty =>
        items.head match { case PName(n) => n; case _ => "" }
      case _ => ""
    }
    filter match {
      case "DCTDecode" =>
        // JPEG → RGBA → PNG (mod.rs:142-148): dims from the DECODED
        // image, no rotation on this branch
        ImageCodec.decodeToRgba(s.raw) match {
          case Some((dw, dh, rgba)) => Right((dw, dh, "png", encodePng(dw, dh, rgba)))
          case None => Left("Failed to decode JPEG image")
        }
      case "FlateDecode" =>
        val data = Filters.inflate(s.raw)
        // container-guess first (mod.rs:152-158): a Flate-wrapped
        // PNG/BMP/GIF decodes by byte-sniffing, then rotate90
        ImageCodec.decodeToRgba(data) match {
          case Some((cw, ch, rgba)) =>
            Right((ch, cw, "png", encodePng(ch, cw, rotate90(rgba, cw, ch))))
          case None =>
            // EXTENSION: raw pixels by /ColorSpace (the reference
            // fail-soft skips these; rotate90 quirk preserved)
            rgbaFromRaw(data, w, h, cs).map { rgba =>
              val rot = rotate90(rgba, w, h)
              (h, w, "png", encodePng(h, w, rot))
            }
        }
      case "" =>
        rgbaFromRaw(s.raw, w, h, cs).map(rgba => (w, h, "png", encodePng(w, h, rgba)))
      case "CCITTFaxDecode" =>
        // EXTENSION (the reference's "Unsupported filter" errors here,
        // mod.rs:163-165): decode scanned-fax bilevel images with the
        // from-spec CCITT decoders — K < 0 = pure T.6 (G4), K = 0 =
        // pure 1-D MH, K > 0 = T.4 mixed (EOL + per-line tag); all
        // three cross-validated against the JDK TIFF codec
        val parms = doc.dictGet(s.dict, "DecodeParms") match {
          case d: PDict => d
          case PArr(items) if items.nonEmpty =>
            doc.resolve(items.head) match { case d: PDict => d; case _ => PDict(Map.empty) }
          case _ => PDict(Map.empty)
        }
        def pInt(key: String, dflt: Long): Long =
          doc.dictGet(parms, key).asInt.getOrElse(dflt)
        def pBool(key: String): Boolean =
          doc.dictGet(parms, key) match { case PBool(v) => v; case _ => false }
        val k = pInt("K", 0)
        val cols = pInt("Columns", 1728)
        val rws = pInt("Rows", h.toLong)
        val blackIs1 = pBool("BlackIs1")
        // dims are attacker-controlled dictionary values: bound EACH
        // axis BEFORE multiplying (a Long×Long product of huge values
        // could wrap past 2^63 and sneak under the area cap), then
        // bound the area before any allocation (cols*rws*4 RGBA
        // bytes) — 2^26 px covers A2 at 1200 dpi with margin
        if (cols <= 0 || rws <= 0 || cols > (1L << 20) || rws > (1L << 20) ||
            cols * rws > (1L << 26))
          Left(s"CCITT dims out of range: ${cols}x$rws")
        else try {
          val gray =
            if (k < 0) CcittFax.decodeG4(s.raw, cols.toInt, rws.toInt, blackIs1)
            else CcittFax.decodeG3(s.raw, cols.toInt, rws.toInt, blackIs1,
              twoD = k > 0, byteAlign = pBool("EncodedByteAlign"))
          // per-image fail-soft means catching EVERYTHING non-fatal: a
          // hostile stream can surface as array-bounds/illegal-argument
          // errors from deep in the bit decoder, and one bad image must
          // never take down the document's other images
          rgbaFromRaw(gray, cols.toInt, rws.toInt, "DeviceGray")
            .map(rgba => (cols.toInt, rws.toInt, "png", encodePng(cols.toInt, rws.toInt, rgba)))
        } catch {
          case scala.util.control.NonFatal(e) =>
            Left(s"CCITT decode failed: ${e.getMessage}")
        }
      case "JBIG2Decode" =>
        // EXTENSION (reference: "Unsupported filter", mod.rs:163-165):
        // embedded JBIG2 generic regions, arithmetic (MQ, templates
        // 0-3, TPGDON) and MMR (T.6 via the CCITT decoder). The
        // optional /JBIG2Globals stream is prepended per the PDF spec.
        val parms = doc.dictGet(s.dict, "DecodeParms") match {
          case d: PDict => d
          case PArr(items) if items.nonEmpty =>
            doc.resolve(items.head) match { case d: PDict => d; case _ => PDict(Map.empty) }
          case _ => PDict(Map.empty)
        }
        val globals = doc.dictGet(parms, "JBIG2Globals") match {
          case gs: PStream =>
            Filters.decode(gs.dict, gs.raw, doc.resolve).getOrElse(gs.raw)
          case _ => Array.emptyByteArray
        }
        // dict dims drive the output allocation: bound like CCITT
        if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20) ||
            w.toLong * h > (1L << 26))
          Left(s"JBIG2 dims out of range: ${w}x$h")
        else try {
          val (gw, gh, gray0) = Jbig2.decodeEmbedded(globals, s.raw)
          // the PDF image dict's /Width /Height GOVERN (PDF 32000
          // §7.4.7): a JBIG2 page-info segment may declare a larger
          // (striped/conservative) page — clip, or pad with white,
          // to the declared dims rather than emitting page-sized output
          val gray =
            if (gw == w && gh == h) gray0
            else {
              val out = new Array[Byte](w * h)
              java.util.Arrays.fill(out, 0xff.toByte)
              var y = 0
              while (y < math.min(h, gh)) {
                System.arraycopy(gray0, y * gw, out, y * w, math.min(w, gw))
                y += 1
              }
              out
            }
          rgbaFromRaw(gray, w, h, "DeviceGray")
            .map(rgba => (w, h, "png", encodePng(w, h, rgba)))
        } catch {
          case scala.util.control.NonFatal(e) =>
            Left(s"JBIG2 decode failed: ${e.getMessage}")
        }
      case other => Left(s"unsupported filter $other") // mod.rs:165
    }
  }

  /** Raw pixels → RGBA (alpha 255), mirroring the reference's
    * RgbaImage construction incl. its strict length checks. */
  private def rgbaFromRaw(data: Array[Byte], w: Int, h: Int,
      colorSpace: String): Either[String, Array[Byte]] = colorSpace match {
    case "DeviceRGB" =>
      if (data.length != w * h * 3) Left("Content length does not match expected size for RGB")
      else {
        val out = new Array[Byte](w * h * 4)
        var i = 0
        while (i < w * h) {
          out(i * 4) = data(i * 3); out(i * 4 + 1) = data(i * 3 + 1)
          out(i * 4 + 2) = data(i * 3 + 2); out(i * 4 + 3) = -1
          i += 1
        }
        Right(out)
      }
    case "DeviceGray" =>
      if (data.length != w * h) Left("Content length does not match expected size for Gray")
      else {
        val out = new Array[Byte](w * h * 4)
        var i = 0
        while (i < w * h) {
          val g = data(i)
          out(i * 4) = g; out(i * 4 + 1) = g; out(i * 4 + 2) = g; out(i * 4 + 3) = -1
          i += 1
        }
        Right(out)
      }
    case other => Left(s"Unsupported color space or image type: $other")
  }

  /** 90° clockwise rotation of an RGBA buffer (image crate rotate90):
    * dst dims (h, w); dst(x, y) = src(y, h-1-x). */
  def rotate90(rgba: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](rgba.length)
    var y = 0
    while (y < w) { // dst rows: dst height = w
      var x = 0
      while (x < h) { // dst cols: dst width = h
        val si = ((h - 1 - x) * w + y) * 4
        val di = (y * h + x) * 4
        out(di) = rgba(si); out(di + 1) = rgba(si + 1)
        out(di + 2) = rgba(si + 2); out(di + 3) = rgba(si + 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Minimal deterministic PNG encoder: 8-bit RGBA (color type 6),
    * filter 0 on every scanline, one zlib IDAT. */
  def encodePng(w: Int, h: Int, rgba: Array[Byte]): Array[Byte] = {
    require(rgba.length == w * h * 4, "rgba buffer size")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tb = tag.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    chunk("IHDR", be(w) ++ be(h) ++ Array[Byte](8, 6, 0, 0, 0))
    // scanlines: filter byte 0 + row
    val scan = new Array[Byte](h * (1 + w * 4))
    var y = 0
    while (y < h) {
      System.arraycopy(rgba, y * w * 4, scan, y * (1 + w * 4) + 1, w * 4)
      y += 1
    }
    val d = new Deflater()
    d.setInput(scan); d.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit RGBA PNG back to its pixel buffer. Covers
    * scanline filter 0 (what [[encodePng]] emits) — others return None
    * fail-soft; a full PNG unfilter pipeline belongs to a real codec. */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    pngMeta(bytes) match {
      case Some((w, h, 6)) =>
        // concatenate IDAT chunks, inflate, strip per-row filter bytes
        val idat = new java.io.ByteArrayOutputStream()
        var off = 8
        var ok = true
        while (ok && off + 8 <= bytes.length) {
          def be(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
            ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
          val len = be(off)
          val tag = new String(bytes.slice(off + 4, off + 8), "US-ASCII")
          if (tag == "IDAT") idat.write(bytes, off + 8, len)
          if (tag == "IEND") ok = false
          off += 8 + len + 4
        }
        try {
          val scan = Filters.inflate(idat.toByteArray)
          val rowLen = 1 + w * 4
          if (scan.length != h * rowLen) None
          else {
            val rgba = new Array[Byte](w * h * 4)
            var y = 0
            var filtersOk = true
            while (filtersOk && y < h) {
              if (scan(y * rowLen) != 0) filtersOk = false // only filter 0
              else System.arraycopy(scan, y * rowLen + 1, rgba, y * w * 4, w * 4)
              y += 1
            }
            if (filtersOk) Some((w, h, rgba)) else None
          }
        } catch { case _: PdfParseException => None }
      case _ => None
    }

  /** Nearest-neighbor resize of an RGBA buffer — REAL pixel math
    * (deterministic integer source mapping sx = x·w/W), codec-free.
    * The brief's multimodal `resize` stage: runs inside the batched
    * per-partition decode like the feature extractors. */
  def resizeRgba(rgba: Array[Byte], w: Int, h: Int,
      outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH * 4)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        val si = (sy * w + sx) * 4
        val di = (y * outW + x) * 4
        out(di) = rgba(si); out(di + 1) = rgba(si + 1)
        out(di + 2) = rgba(si + 2); out(di + 3) = rgba(si + 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize a PNG payload (decode → nearest-neighbor → re-encode);
    * None for undecodable inputs (fail-soft, like every decode path).
    * The codec-free [[decodePng]] fast path covers this module's own
    * filter-0 RGBA output (no AWT churn in the hot thumbnail loop);
    * any OTHER valid PNG — Sub/Up/Average/Paeth-filtered rows,
    * palette, 16-bit, grayscale — falls through to the JDK codec
    * ([[ImageCodec.decodeToRgba]] reads them all). */
  def resizePng(png: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    decodePng(png).orElse(ImageCodec.decodeToRgba(png)).map { case (w, h, rgba) =>
      encodePng(outW, outH, resizeRgba(rgba, w, h, outW, outH))
    }

  /** Parse width/height/color type from a PNG's IHDR (codec-free
    * metadata decode for the multimodal feature stage). */
  def pngMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 33 || !bytes.take(8).sameElements(sig)) return None
    def be(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
      ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    if (new String(bytes.slice(12, 16), "US-ASCII") != "IHDR") None
    else Some((be(16), be(20), bytes(25) & 0xff))
  }

  /** All page images of one PDF document, in the reference's
    * enumeration order, named with its formula `{id}_{page}_{i}.png`
    * (mod.rs:108). Undecodable images are skipped fail-soft, exactly
    * like the reference's `.is_ok()` guard. */
  def documentImages(docId: String, pdfBytes: Array[Byte]): Vector[ImageOut] = {
    val doc = PdfDocument.load(pdfBytes)
    (1 to doc.pageCount).flatMap { pageNum =>
      val page = doc.pages(pageNum - 1)
      ContentText.pageImageObjects(doc, page).zipWithIndex.flatMap { case ((_, s), i) =>
        decode(doc, s) match {
          case Right((w, h, fmt, bytes)) =>
            Some(ImageOut(s"${docId}_${pageNum}_$i.png", w, h, fmt, bytes))
          case Left(_) => None
        }
      }
    }.toVector
  }
}
