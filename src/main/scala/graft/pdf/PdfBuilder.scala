package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Deterministic minimal-PDF builder for fixtures (FIXTURES.md §4).
  *
  * The reference ships no sample PDFs (SURVEY.md §5.1), so expected
  * extraction output is fixed *by construction*: every content stream
  * here is authored with unambiguous Tj/TJ text. No wall-clock, no
  * randomness — byte-identical output for identical inputs.
  */
object PdfBuilder {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** PNG "Up" predictor (filter type 2) encoding, for xref streams. */
  private def predictUp(data: Array[Byte], rowLen: Int): Array[Byte] = {
    val nRows = data.length / rowLen
    val out = new Array[Byte]((rowLen + 1) * nRows)
    val prior = new Array[Byte](rowLen)
    var r = 0
    while (r < nRows) {
      out(r * (rowLen + 1)) = 2
      var i = 0
      while (i < rowLen) {
        val cur = data(r * rowLen + i)
        out(r * (rowLen + 1) + 1 + i) = ((cur - prior(i)) & 0xff).toByte
        i += 1
      }
      System.arraycopy(data, r * rowLen, prior, 0, rowLen)
      r += 1
    }
    out
  }

  private final class Builder {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.TreeMap.empty[Int, Int]
    /** When set, [[streamObj]] payloads and [[textStr]]/[[strBytes]]
      * strings are encrypted; every call site passes the owning
      * object's number EXPLICITLY (bodies are often formatted before
      * their object opens, so there is deliberately no implicit
      * current-object state to key off). */
    var crypt: Option[PdfCrypt.StdSecurityHandler] = None
    def pos: Int = out.size()
    def raw(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def raw(b: Array[Byte]): Unit = out.write(b)
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = pos
      raw(s"$num 0 obj\n"); body; raw("\nendobj\n")
    }
    def streamObj(num: Int, dictExtra: String, data: Array[Byte]): Unit = obj(num) {
      val payload = crypt.map(_.encryptStream(num, 0, data)).getOrElse(data)
      raw(s"<< /Length ${payload.length} $dictExtra >>\nstream\n")
      raw(payload)
      raw("\nendstream")
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Object layout for an n-page doc: 1=Catalog 2=Pages 3=Font F1,
    * then per page i (0-based): page = 4+2i, content = 5+2i. */
  private def writeHeaderObjects(b: Builder, nPages: Int, fontExtra: String = ""): Unit = {
    b.raw("%PDF-1.7\n%âãÏÓ\n")
    b.obj(1) { b.raw("<< /Type /Catalog /Pages 2 0 R >>") }
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    b.obj(2) { b.raw(s"<< /Type /Pages /Kids [$kids] /Count $nPages /MediaBox [0 0 612 792] >>") }
    b.obj(3) { b.raw(s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica $fontExtra >>") }
  }

  private def writeClassicXref(b: Builder, rootRef: String = "1 0 R",
      trailerExtra: String = ""): Array[Byte] = {
    val maxObj = b.offsets.keys.max
    val xrefPos = b.pos
    b.raw(s"xref\n0 ${maxObj + 1}\n")
    b.raw(f"${0}%010d 65535 f \n")
    (1 to maxObj).foreach { n =>
      val off = b.offsets.getOrElse(n, 0)
      b.raw(f"$off%010d 00000 n \n")
    }
    b.raw(s"trailer\n<< /Size ${maxObj + 1} /Root $rootRef$trailerExtra >>\nstartxref\n$xrefPos\n%%EOF\n")
    b.bytes
  }

  private def hexStr(bs: Array[Byte]): String = bs.map(x => f"${x & 0xff}%02X").mkString

  /** Shared page/content layout for the encrypted fixtures: header
    * objects + per-page dict and handler-encrypted content stream. */
  private def writeEncryptedPages(b: Builder, texts: Seq[String],
      h: PdfCrypt.StdSecurityHandler): Unit = {
    b.crypt = Some(h)
    writeHeaderObjects(b, texts.length)
    texts.zipWithIndex.foreach { case (t, i) =>
      val pageObj = 4 + 2 * i; val contObj = 5 + 2 * i
      b.obj(pageObj) {
        b.raw(s"<< /Type /Page /Parent 2 0 R /Contents $contObj 0 R " +
          "/Resources << /Font << /F1 3 0 R >> >> >>")
      }
      b.streamObj(contObj, "", tjLine(t).getBytes(ISO_8859_1))
    }
  }

  /** Encryption cipher families the metadata fixtures cycle through —
    * the same three the `pdfz_encrypted` oracle pins. */
  sealed trait EncKind
  case object EncRc4 extends EncKind    // V2/R3 RC4-128
  case object EncAes extends EncKind    // V4/R4 /AESV2 AES-128-CBC
  case object EncAes256 extends EncKind // V5/R6 /AESV3 AES-256 (PDF 2.0)

  /** Deterministic empty-password encryption materials for the
    * string-bearing fixtures: the live handler, the /Encrypt dict
    * body (raw — its own strings are never encrypted, §7.6.2) and the
    * trailer /ID extra. */
  private def encMaterials(kind: EncKind): (PdfCrypt.StdSecurityHandler, String, String) =
    kind match {
      case EncAes256 =>
        val fileKey = (0 until 32).map(i => (i * 7 + 11).toByte).toArray
        val (u, ue, o, oe) = PdfCrypt.buildR6Entries(fileKey, seed = 5)
        val h = new PdfCrypt.StdSecurityHandler(fileKey, PdfCrypt.Aes256Streams)
        val dict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
          s"/P -44 /O <${hexStr(o)}> /OE <${hexStr(oe)}> /U <${hexStr(u)}> /UE <${hexStr(ue)}> " +
          "/Perms <00000000000000000000000000000000> >>"
        (h, dict, "")
      case _ =>
        val aes = kind == EncAes
        val r = if (aes) 4 else 3
        val id0 = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
        val p = -44
        val o = PdfCrypt.computeO(r, 128)
        val key = PdfCrypt.fileKey(o, p, id0, r, 128)
        val u = PdfCrypt.computeU(r, key, id0)
        val mode = if (aes) PdfCrypt.AesStreams else PdfCrypt.Rc4Streams
        val h = new PdfCrypt.StdSecurityHandler(key, mode)
        val cf =
          if (aes) "/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
            "/StmF /StdCF /StrF /StdCF"
          else "/V 2 /R 3 /Length 128"
        val dict = s"<< /Filter /Standard $cf /P $p /O <${hexStr(o)}> /U <${hexStr(u)}> >>"
        (h, dict, s" /ID [<${hexStr(id0)}> <${hexStr(id0)}>]")
    }

  /** Arm `b` for an encrypted fixture; returns the trailer extra to
    * pass to [[writeClassicXref]] after [[finishEncrypted]]. */
  private def armEncryption(b: Builder, enc: Option[EncKind]): Option[(String, String)] =
    enc.map { kind =>
      val (h, dict, idExtra) = encMaterials(kind)
      b.crypt = Some(h)
      (dict, idExtra)
    }

  /** Write the /Encrypt dictionary (raw) after all content objects
    * and return the full trailer extra. */
  private def finishEncrypted(b: Builder, armed: Option[(String, String)]): String =
    armed match {
      case Some((dict, idExtra)) =>
        val encObj = b.offsets.keys.max + 1
        b.crypt = None // the /Encrypt dict itself is never encrypted
        b.obj(encObj) { b.raw(dict) }
        s" /Encrypt $encObj 0 R$idExtra"
      case None => ""
    }

  /** Encrypted document (ISO 32000-1 §7.6 standard security handler,
    * EMPTY user/owner passwords — the openable-but-encrypted web-PDF
    * class the reference fails on): two text pages whose content
    * streams are RC4-128 (R3) or AES-128-CBC (R4 /AESV2) encrypted
    * with the per-object key of Algorithm 1; /O /U computed from the
    * spec's algorithms, /ID deterministic. */
  def withEncryption(aes: Boolean, texts: Seq[String] = Seq("secret one", "secret two"),
      encryptMetadata: Boolean = true, identityStreams: Boolean = false,
      userPw: String = "", ownerPw: String = ""): Array[Byte] = {
    val r = if (aes || identityStreams) 4 else 3
    val lengthBits = 128
    val id0 = (0 until 16).map(i => (i * 17 + 3).toByte).toArray
    val p = -44
    val userB = userPw.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ownerB = ownerPw.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val o = PdfCrypt.computeO(r, lengthBits, ownerB, userB)
    val key = PdfCrypt.fileKey(o, p, id0, r, lengthBits, encryptMetadata, userB)
    val u = PdfCrypt.computeU(r, key, id0)
    val mode =
      if (identityStreams) PdfCrypt.IdentityStreams
      else if (aes) PdfCrypt.AesStreams
      else PdfCrypt.Rc4Streams
    val h = new PdfCrypt.StdSecurityHandler(key, mode)
    import PdfBuilder.{hexStr => hex}
    val b = new Builder
    writeEncryptedPages(b, texts, h)
    val encObj = 4 + 2 * texts.length
    val cf =
      if (identityStreams)
        "/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /V2 /Length 16 >> >> " +
          "/StmF /Identity /StrF /StdCF"
      else if (aes)
        "/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF"
      else "/V 2 /R 3 /Length 128"
    val em = if (encryptMetadata) "" else " /EncryptMetadata false"
    b.obj(encObj) {
      b.raw(s"<< /Filter /Standard $cf$em /P $p /O <${hex(o)}> /U <${hex(u)}> >>")
    }
    writeClassicXref(b,
      trailerExtra = s" /Encrypt $encObj 0 R /ID [<${hex(id0)}> <${hex(id0)}>]")
  }

  /** AES-256 (PDF 2.0, V5/R6 /AESV3) encrypted document with EMPTY
    * passwords: deterministic 32-byte file key, /U /UE /O /OE built by
    * the spec's Algorithm-2.B hardened hash ([[PdfCrypt.buildR6Entries]]),
    * streams AES-256-CBC with the file key directly. */
  def withEncryptionR6(texts: Seq[String] = Seq("secret one", "secret two"),
      userPw: String = "", ownerPw: String = ""): Array[Byte] = {
    val fileKey = (0 until 32).map(i => (i * 7 + 11).toByte).toArray
    // no-owner-password fixtures fall back to the user password (the
    // classic Algorithm-3 convention; an EMPTY R6 owner hash would
    // correctly open the doc with no password at all via the /O path)
    val effOwner = if (ownerPw.nonEmpty) ownerPw else userPw
    val (u, ue, o, oe) = PdfCrypt.buildR6Entries(fileKey, seed = 5,
      userPw.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      effOwner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = new PdfCrypt.StdSecurityHandler(fileKey, PdfCrypt.Aes256Streams)
    import PdfBuilder.{hexStr => hex}
    val b = new Builder
    writeEncryptedPages(b, texts, h)
    val encObj = 4 + 2 * texts.length
    b.obj(encObj) {
      b.raw("<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/P -44 /O <${hex(o)}> /OE <${hex(oe)}> /U <${hex(u)}> /UE <${hex(ue)}> " +
        "/Perms <00000000000000000000000000000000> >>")
    }
    writeClassicXref(b, trailerExtra = s" /Encrypt $encObj 0 R")
  }

  /** Classic-xref document. Each element of `pageContents` is raw
    * content-stream source; `flate` compresses the content streams. */
  def simple(pageContents: Seq[String], flate: Boolean = false,
             pageExtras: Seq[String] = Seq.empty,
             fontExtra: String = ""): Array[Byte] = {
    val b = new Builder
    writeHeaderObjects(b, pageContents.length, fontExtra)
    pageContents.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i
      val contNum = 5 + 2 * i
      val extra = if (pageExtras.isDefinedAt(i)) pageExtras(i) else ""
      b.obj(pageNum) {
        b.raw(s"<< /Type /Page /Parent 2 0 R /Contents $contNum 0 R " +
          s"/Resources << /Font << /F1 3 0 R >> $extra >> >>")
      }
      val data = content.getBytes(ISO_8859_1)
      if (flate) b.streamObj(contNum, "/Filter /FlateDecode", deflate(data))
      else b.streamObj(contNum, "", data)
    }
    writeClassicXref(b)
  }

  /** Page content helper: one `(text) Tj` line at the given y. */
  def tjLine(text: String, y: Int = 720): String = {
    val esc = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    s"BT /F1 12 Tf 72 $y Td ($esc) Tj ET"
  }

  /** Multi-line page: each string on its own Td-positioned line. */
  def multiLine(lines: Seq[String]): String = {
    val body = lines.zipWithIndex.map { case (t, i) =>
      val esc = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      val move = if (i == 0) "72 720 Td" else "0 -14 Td"
      s"$move ($esc) Tj"
    }.mkString(" ")
    s"BT /F1 12 Tf $body ET"
  }

  /** TJ-array page: `[(Hel) -20 (lo)] TJ` — kerning inserts nothing. */
  def tjArray(parts: Seq[String], kern: Int = -20): String = {
    val arr = parts.map { p =>
      val esc = p.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      s"($esc)"
    }.mkString(s" $kern ")
    s"BT /F1 12 Tf 72 720 Td [$arr] TJ ET"
  }

  /** Document whose page shows text, then `Do`s a Form XObject
    * carrying its own text under its OWN `/Resources` — the
    * text-inside-forms class (letterheads, stamps, generated PDFs)
    * a page-stream-only walk cannot see. Options:
    * `nestedText` — the form `Do`s a second, nested form (depth-2
    * chain, resources inherited from the outer form per §8.10.1);
    * `cyclic` — the form `Do`s ITSELF, so extraction must terminate
    * via the visited guard. Object layout: 1-3 header, 4 page,
    * 5 content, 6 form, 7 nested form (when present). */
  def withFormXObject(pageText: String, formText: String,
      nestedText: Option[String] = None,
      cyclic: Boolean = false): Array[Byte] = {
    require(!(cyclic && nestedText.isDefined), "pick one topology")
    val b = new Builder
    writeHeaderObjects(b, 1)
    b.obj(4) {
      b.raw("<< /Type /Page /Parent 2 0 R /Contents 5 0 R " +
        "/Resources << /Font << /F1 3 0 R >> /XObject << /Fm0 6 0 R >> >> >>")
    }
    b.streamObj(5, "",
      s"${tjLine(pageText)}\n/Fm0 Do".getBytes(ISO_8859_1))
    val innerRef =
      if (nestedText.isDefined) " /XObject << /Fm1 7 0 R >>"
      else if (cyclic) " /XObject << /Fm1 6 0 R >>"
      else ""
    val formBody =
      if (nestedText.isDefined || cyclic) s"${tjLine(formText, 700)}\n/Fm1 Do"
      else tjLine(formText, 700)
    b.streamObj(6,
      "/Type /XObject /Subtype /Form /BBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >>$innerRef >>",
      formBody.getBytes(ISO_8859_1))
    // the nested form has NO /Resources of its own: it inherits the
    // caller's scope (§8.10.1 fallback) — the /F1 it names resolves
    // through form 6's resources
    nestedText.foreach { t =>
      b.streamObj(7,
        "/Type /XObject /Subtype /Form /BBox [0 0 612 792]",
        tjLine(t, 680).getBytes(ISO_8859_1))
    }
    writeClassicXref(b)
  }

  /** Document with a trailer /Info dictionary (§14.3.3) and per-page
    * /Link annotations carrying /URI actions (§12.5.6.5, §12.6.4.7).
    * `info` maps each /Info key to its EXACT string bytes (caller
    * controls the §7.9.2.2 spelling — UTF-16BE-with-BOM vs raw
    * PDFDocEncoding bytes; see [[utf16Bytes]]/[[latin1Bytes]]);
    * `links(i)` lists page i's (uri, rect) pairs, rects written in
    * the GIVEN corner order so a caller can exercise the min/max
    * normalization. With `decoys`, page 0 additionally gets a /Text
    * note annotation and a URI-less /GoTo link — both must be skipped
    * by link extraction. With `enc`, every string and stream is
    * Algorithm-1 encrypted under the chosen cipher. Object layout:
    * 1-3 header, 4+2i/5+2i page/content, then annotations, then
    * /Info, then (encrypted) /Encrypt last. */
  def withInfoAndLinks(pageContents: Seq[String],
      info: Seq[(String, Array[Byte])],
      links: Seq[Seq[(String, (Int, Int, Int, Int))]],
      decoys: Boolean = true,
      enc: Option[EncKind] = None): Array[Byte] = {
    require(links.length == pageContents.length, "links per page")
    val b = new Builder
    val armed = armEncryption(b, enc)
    writeHeaderObjects(b, pageContents.length)
    var next = 4 + 2 * pageContents.length
    val annotRefs: Seq[Seq[String]] = links.zipWithIndex.map { case (pl, i) =>
      val real = pl.map { case (uri, (x0, y0, x1, y1)) =>
        val n = next; next += 1
        b.obj(n) {
          b.raw(s"<< /Type /Annot /Subtype /Link /Rect [$x0 $y0 $x1 $y1] " +
            s"/A << /S /URI /URI ${strBytes(b, n, uri.getBytes(ISO_8859_1),
              literalOk = true, lit = uri)} >> >>")
        }
        s"$n 0 R"
      }
      val extra = if (decoys && i == 0) {
        val note = next; next += 1
        b.obj(note) {
          b.raw(s"<< /Type /Annot /Subtype /Text /Rect [0 0 10 10] " +
            s"/Contents ${textStr(b, note, "a sticky note, not a link")} >>")
        }
        val goto = next; next += 1
        b.obj(goto) {
          b.raw("<< /Type /Annot /Subtype /Link /Rect [5 5 15 15] " +
            "/A << /S /GoTo /D [4 0 R /Fit] >> >>")
        }
        Seq(s"$note 0 R", s"$goto 0 R")
      } else Seq.empty
      real ++ extra
    }
    pageContents.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i; val contNum = 5 + 2 * i
      val annots =
        if (annotRefs(i).nonEmpty) s" /Annots [${annotRefs(i).mkString(" ")}]"
        else ""
      b.obj(pageNum) {
        b.raw(s"<< /Type /Page /Parent 2 0 R /Contents $contNum 0 R " +
          s"/Resources << /Font << /F1 3 0 R >> >>$annots >>")
      }
      b.streamObj(contNum, "", tjLine(content).getBytes(ISO_8859_1))
    }
    val infoNum = next
    val infoBody = info.map { case (k, v) =>
      s"/$k ${strBytes(b, infoNum, v)}"
    }.mkString(" ")
    b.obj(infoNum) { b.raw(s"<< $infoBody >>") }
    writeClassicXref(b,
      trailerExtra = s" /Info $infoNum 0 R" + finishEncrypted(b, armed))
  }

  /** The §7.9.2.2 Unicode spelling of a text string as raw bytes:
    * UTF-16BE with byte-order mark. */
  def utf16Bytes(s: String): Array[Byte] =
    Array(0xFE.toByte, 0xFF.toByte) ++
      s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)

  /** Raw single-byte string bytes (PDFDocEncoding spelling — the
    * caller picks codes from Annex D.3, e.g. 0xA0 = Euro). */
  def latin1Bytes(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  /** Document with an outline (bookmark) tree (§12.3.3). `items` is
    * the PRE-ORDER flattened tree: (level, title, page). Structure is
    * rebuilt into /First //Last //Next //Prev //Parent //Count links
    * (parent of an item = the nearest preceding item one level up).
    * Destination form cycles the spec's branches: level-0 items get a
    * direct /Dest [pg 0 R /XYZ 0 792 0]; deeper items a /A /GoTo /D
    * [pg 0 R /Fit] action; page < 0 writes a NAMED destination
    * /Dest (nowhere) — out of extraction's declared scope, must
    * surface as page -1. Titles with any non-ASCII char are written
    * as UTF-16BE hex strings with BOM, others as escaped literals —
    * both §7.9.2.2 branches. The live catalog is written LAST and the
    * trailer's /Root points at it (object 1 stays a decoy catalog
    * without /Outlines — a reader keying on object order instead of
    * /Root sees no outline at all). */
  def withOutline(pageContents: Seq[String],
      items: Seq[(Int, String, Int)],
      namedDests: Boolean = false,
      enc: Option[EncKind] = None): Array[Byte] = {
    val b = new Builder
    val armed = armEncryption(b, enc)
    writeHeaderObjects(b, pageContents.length)
    pageContents.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i; val contNum = 5 + 2 * i
      b.obj(pageNum) {
        b.raw(s"<< /Type /Page /Parent 2 0 R /Contents $contNum 0 R " +
          "/Resources << /Font << /F1 3 0 R >> >> >>")
      }
      b.streamObj(contNum, "", tjLine(content).getBytes(ISO_8859_1))
    }
    val rootNum = 4 + 2 * pageContents.length // outline root
    val itemNum = items.indices.map(_ + rootNum + 1)
    val parents = preOrderParents(items.map(_._1), "outline item")
    def kidsOf(p: Int): Seq[Int] = items.indices.filter(parents(_) == p)
    val top = kidsOf(-1)
    require(top.nonEmpty, "outline needs at least one top-level item")
    b.obj(rootNum) {
      b.raw(s"<< /Type /Outlines /First ${itemNum(top.head)} 0 R " +
        s"/Last ${itemNum(top.last)} 0 R /Count ${items.length} >>")
    }
    def destArr(page: Int, lvl: Int): String =
      if (lvl == 0) s"[${4 + 2 * page} 0 R /XYZ 0 792 0]"
      else s"[${4 + 2 * page} 0 R /Fit]"
    // with namedDests, string-named items route through the catalog's
    // /Names /Dests NAME TREE (§7.7.4), name-object items through the
    // PDF-1.1 catalog /Dests dictionary (§12.3.2.3) — both indirect
    // forms a reader must resolve; (nowhere) stays absent everywhere
    val treeEntries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val dictDests = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    items.zipWithIndex.foreach { case ((lvl, title, page), i) =>
      val sibs = kidsOf(parents(i))
      val at = sibs.indexOf(i)
      val kids = kidsOf(i)
      val parentRef =
        if (parents(i) < 0) s"$rootNum 0 R" else s"${itemNum(parents(i))} 0 R"
      val dest =
        if (page < 0) s"/Dest ${textStr(b, itemNum(i), "nowhere")}"
        else if (!namedDests) {
          if (lvl == 0) s"/Dest ${destArr(page, 0)}"
          else s"/A << /S /GoTo /D ${destArr(page, 1)} >>"
        } else if (lvl == 0 && i % 2 == 0) {
          treeEntries += ((s"nmS$i", destArr(page, 0)))
          s"/Dest ${textStr(b, itemNum(i), s"nmS$i")}"
        } else if (lvl == 0) {
          dictDests += ((s"NmN$i", destArr(page, 0)))
          s"/Dest /NmN$i"
        } else {
          treeEntries += ((s"nmC$i", destArr(page, 1)))
          s"/A << /S /GoTo /D ${textStr(b, itemNum(i), s"nmC$i")} >>"
        }
      val links = new StringBuilder
      if (at > 0) links ++= s" /Prev ${itemNum(sibs(at - 1))} 0 R"
      if (at < sibs.length - 1) links ++= s" /Next ${itemNum(sibs(at + 1))} 0 R"
      if (kids.nonEmpty)
        links ++= s" /First ${itemNum(kids.head)} 0 R /Last ${itemNum(kids.last)} 0 R /Count ${kids.length}"
      b.obj(itemNum(i)) {
        b.raw(s"<< /Title ${textStr(b, itemNum(i), title)} /Parent $parentRef $dest${links.result()} >>")
      }
    }
    val catNum = rootNum + items.length + 1
    val ntRoot = catNum + 1
    b.obj(catNum) {
      val dests =
        if (dictDests.isEmpty) ""
        else " /Dests << " + dictDests.map { case (n, a) =>
          // dict-wrapped form: the /Dests value may be a dict with /D
          s"/$n << /D $a >>"
        }.mkString(" ") + " >>"
      val names =
        if (treeEntries.isEmpty) ""
        else s" /Names << /Dests $ntRoot 0 R >>"
      b.raw(s"<< /Type /Catalog /Pages 2 0 R /Outlines $rootNum 0 R$dests$names >>")
    }
    if (treeEntries.nonEmpty) {
      // 2-level name tree: sorted names split across two /Kids leaves
      // with /Limits — the walk a reader must implement (§7.9.6)
      val sorted = treeEntries.sortBy(_._1).toVector
      val half = (sorted.length + 1) / 2
      val parts = Vector(sorted.take(half), sorted.drop(half)).filter(_.nonEmpty)
      val kidNums = parts.indices.map(_ + ntRoot + 1)
      b.obj(ntRoot) {
        b.raw(s"<< /Kids [${kidNums.map(k => s"$k 0 R").mkString(" ")}] >>")
      }
      parts.zip(kidNums).foreach { case (entries, kn) =>
        val lims = s"[${textStr(b, kn, entries.head._1)} ${textStr(b, kn, entries.last._1)}]"
        val ns = entries.map { case (n, a) => s"${textStr(b, kn, n)} $a" }.mkString(" ")
        b.obj(kn) { b.raw(s"<< /Limits $lims /Names [$ns] >>") }
      }
    }
    writeClassicXref(b, rootRef = s"$catNum 0 R",
      trailerExtra = finishEncrypted(b, armed))
  }

  /** Document with an /AcroForm field tree (§12.7). `fields` is the
    * PRE-ORDER flattened tree: (level, partialName, ft, value) —
    * `ft`/`value` None omit the key (exercising §12.7.4.1
    * inheritance); a value starting with '/' is written as a NAME
    * (radio/checkbox state), anything else as a text string (UTF-16
    * hex when non-ASCII). Every top-level field additionally gets a
    * WIDGET kid (a /Kids entry without /T) that extraction must treat
    * as presentation, not a child field. The live catalog is written
    * last (object 1 stays a decoy without /AcroForm). */
  def withAcroForm(pageContents: Seq[String],
      fields: Seq[(Int, String, Option[String], Option[String])],
      enc: Option[EncKind] = None): Array[Byte] = {
    val b = new Builder
    val armed = armEncryption(b, enc)
    writeHeaderObjects(b, pageContents.length)
    pageContents.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i; val contNum = 5 + 2 * i
      b.obj(pageNum) {
        b.raw(s"<< /Type /Page /Parent 2 0 R /Contents $contNum 0 R " +
          "/Resources << /Font << /F1 3 0 R >> >> >>")
      }
      b.streamObj(contNum, "", tjLine(content).getBytes(ISO_8859_1))
    }
    val fieldBase = 4 + 2 * pageContents.length
    val fieldNum = fields.indices.map(_ + fieldBase)
    // widget decoys exist only for top-level fields: number them
    // compactly after the field objects (no xref holes)
    val widgetNum: Map[Int, Int] = fields.indices.filter(fields(_)._1 == 0)
      .zipWithIndex.map { case (i, j) => i -> (fieldBase + fields.length + j) }
      .toMap
    val parents = preOrderParents(fields.map(_._1), "form field")
    def kidsOf(p: Int): Seq[Int] = fields.indices.filter(parents(_) == p)
    fields.zipWithIndex.foreach { case ((lvl, name, ft, value), i) =>
      val kids = kidsOf(i).map(k => s"${fieldNum(k)} 0 R") ++
        (if (lvl == 0) Seq(s"${widgetNum(i)} 0 R") else Seq.empty)
      if (lvl == 0) {
        b.obj(widgetNum(i)) {
          b.raw("<< /Subtype /Widget /Rect [0 0 1 1] >>") // no /T: not a field
        }
      }
      val parts = new StringBuilder(s"<< /T ${textStr(b, fieldNum(i), name)}")
      ft.foreach(t => parts ++= s" /FT /$t")
      value.foreach { v =>
        parts ++= (if (v.startsWith("/")) s" /V $v"
          else s" /V ${textStr(b, fieldNum(i), v)}")
      }
      if (parents(i) >= 0) parts ++= s" /Parent ${fieldNum(parents(i))} 0 R"
      if (kids.nonEmpty) parts ++= s" /Kids [${kids.mkString(" ")}]"
      parts ++= " >>"
      b.obj(fieldNum(i)) { b.raw(parts.result()) }
    }
    val catNum = fieldBase + fields.length + widgetNum.size
    val top = kidsOf(-1).map(k => s"${fieldNum(k)} 0 R").mkString(" ")
    b.obj(catNum) {
      b.raw(s"<< /Type /Catalog /Pages 2 0 R /AcroForm << /Fields [$top] >> >>")
    }
    writeClassicXref(b, rootRef = s"$catNum 0 R",
      trailerExtra = finishEncrypted(b, armed))
  }

  /** Document with a /PageLabels number tree (§12.4.2), flat /Nums
    * form. `ranges` = (startPageIndex, style, prefix, st) — None omits
    * the key (no /S → prefix-only labels; no /St → default 1). */
  def withPageLabels(pageContents: Seq[String],
      ranges: Seq[(Int, Option[String], Option[String], Option[Int])],
      kidsTree: Boolean = false,
      enc: Option[EncKind] = None): Array[Byte] = {
    val b = new Builder
    val armed = armEncryption(b, enc)
    writeHeaderObjects(b, pageContents.length)
    pageContents.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i; val contNum = 5 + 2 * i
      b.obj(pageNum) {
        b.raw(s"<< /Type /Page /Parent 2 0 R /Contents $contNum 0 R " +
          "/Resources << /Font << /F1 3 0 R >> >> >>")
      }
      b.streamObj(contNum, "", tjLine(content).getBytes(ISO_8859_1))
    }
    val catNum = 4 + 2 * pageContents.length
    def numsFor(rs: Seq[(Int, Option[String], Option[String], Option[Int])],
        objNum: Int): String =
      rs.map { case (key, style, prefix, st) =>
        val parts = new StringBuilder(s"$key <<")
        style.foreach(x => parts ++= s" /S /$x")
        prefix.foreach(p => parts ++= s" /P ${textStr(b, objNum, p)}")
        st.foreach(x => parts ++= s" /St $x")
        parts ++= " >>"
        parts.result()
      }.mkString(" ")
    if (!kidsTree) {
      b.obj(catNum) {
        b.raw(s"<< /Type /Catalog /Pages 2 0 R /PageLabels " +
          s"<< /Nums [${numsFor(ranges, catNum)}] >> >>")
      }
    } else {
      // 2-level NUMBER tree (§7.9.7): the root holds /Kids only, two
      // leaves carry sorted halves with integer /Limits
      val sorted = ranges.sortBy(_._1)
      val half = (sorted.length + 1) / 2
      val parts = Seq(sorted.take(half), sorted.drop(half)).filter(_.nonEmpty)
      val kidNums = parts.indices.map(_ + catNum + 1)
      b.obj(catNum) {
        b.raw(s"<< /Type /Catalog /Pages 2 0 R /PageLabels " +
          s"<< /Kids [${kidNums.map(k => s"$k 0 R").mkString(" ")}] >> >>")
      }
      parts.zip(kidNums).foreach { case (rs, kn) =>
        b.obj(kn) {
          b.raw(s"<< /Limits [${rs.head._1} ${rs.last._1}] " +
            s"/Nums [${numsFor(rs, kn)}] >>")
        }
      }
    }
    writeClassicXref(b, rootRef = s"$catNum 0 R",
      trailerExtra = finishEncrypted(b, armed))
  }

  /** Pre-order tree recovery shared by the outline and AcroForm
    * builders: parent of item i = the nearest preceding item one
    * level up (-1 for roots). */
  private def preOrderParents(levels: Seq[Int], what: String): IndexedSeq[Int] =
    levels.indices.map { i =>
      if (levels(i) == 0) -1
      else (i - 1 to 0 by -1).find(j => levels(j) == levels(i) - 1)
        .getOrElse(throw new IllegalArgumentException(s"orphan $what"))
    }

  /** Text string in its two §7.9.2.2 spellings: escaped literal for
    * ASCII, UTF-16BE hex with BOM otherwise. With the builder armed
    * for encryption, the same bytes are written Algorithm-1-encrypted
    * as a hex string under object `num`'s key (hence the explicit
    * object number — several builders format bodies before opening
    * the object). */
  private def textStr(b: Builder, num: Int, s: String): String =
    strBytes(b, num,
      if (s.forall(_ < 0x80)) s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      else Array(0xFE.toByte, 0xFF.toByte) ++
        s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE),
      literalOk = s.forall(_ < 0x80), s)

  /** Raw string bytes → the written spelling: escaped literal when the
    * caller says the plain form is representable, hex otherwise;
    * always encrypted hex when the builder is armed. */
  private def strBytes(b: Builder, num: Int, bytes: Array[Byte],
      literalOk: Boolean = false, lit: String = ""): String =
    b.crypt match {
      case Some(h) => "<" + hexStr(h.encryptString(num, 0, bytes)) + ">"
      case None =>
        if (literalOk)
          s"(${lit.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")})"
        else "<" + hexStr(bytes) + ">"
    }

  /** UTF-16BE hex string WITH byte-order mark — the §7.9.2.2 Unicode
    * branch of the text-string type, as writers emit it in /Info. */
  def utf16HexString(s: String): String =
    "<FEFF" + hexStr(s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)) + ">"

  /** Document whose body objects live in a /Type /ObjStm object stream
    * addressed through a Flate+predictor-12 xref stream (§7.5.7-7.5.8).
    * Content stream stays top-level (streams cannot be compressed
    * objects). Layout: 5=content, 6=ObjStm{1,2,3,4}, 7=XRef stream. */
  def objStm(pageContent: String): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.7\n%âãÏÓ\n")
    // content stream (top level)
    val data = pageContent.getBytes(ISO_8859_1)
    b.streamObj(5, "", data)

    // object stream containing objects 1..4
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
      3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      4 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>")
    val bodies = inner.map(_._2)
    val offs = bodies.scanLeft(0)((acc, s) => acc + s.length + 1).init
    val header = inner.map(_._1).zip(offs).map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val stmPayload = (header + bodies.mkString("\n")).getBytes(ISO_8859_1)
    val stmDeflated = deflate(stmPayload)
    b.offsets(6) = b.pos
    b.raw(s"6 0 obj\n<< /Type /ObjStm /N ${inner.length} /First ${header.length} " +
      s"/Length ${stmDeflated.length} /Filter /FlateDecode >>\nstream\n")
    b.raw(stmDeflated)
    b.raw("\nendstream\nendobj\n")

    // xref stream: W [1 2 2]; rows for objects 0..7
    val xrefPos = b.pos
    def row(t: Int, f2: Int, f3: Int): Array[Byte] =
      Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    val rows = new ByteArrayOutputStream()
    rows.write(row(0, 0, 0xffff))                    // obj 0: free
    (1 to 4).zipWithIndex.foreach { case (_, idx) => rows.write(row(2, 6, idx)) }
    rows.write(row(1, b.offsets(5), 0))              // obj 5: content
    rows.write(row(1, b.offsets(6), 0))              // obj 6: ObjStm
    rows.write(row(1, xrefPos, 0))                   // obj 7: this stream
    val predicted = predictUp(rows.toByteArray, 5)
    val xrefData = deflate(predicted)
    b.offsets(7) = xrefPos
    b.raw(s"7 0 obj\n<< /Type /XRef /Size 8 /W [1 2 2] /Root 1 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 5 >> " +
      s"/Length ${xrefData.length} >>\nstream\n")
    b.raw(xrefData)
    b.raw("\nendstream\nendobj\n")
    b.raw(s"startxref\n$xrefPos\n%%EOF\n")
    b.bytes
  }

  /** Deterministic 8×8 RGB test pattern for the JPEG fixture. */
  def jpegPatternRgb: Array[Byte] = {
    val rgb = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8) {
      val i = (y * 8 + x) * 3
      rgb(i) = (x * 32).toByte; rgb(i + 1) = (y * 32).toByte; rgb(i + 2) = ((x + y) * 16).toByte
    }
    rgb
  }

  /** Deterministic 2×3 RGBA test pattern for the Flate-wrapped-PNG
    * fixture (distinct per-pixel values so rotation is pinnable). */
  def pngPatternRgba: Array[Byte] =
    Array.tabulate[Byte](2 * 3 * 4)(i => if (i % 4 == 3) -1 else (i * 11).toByte)

  /** One page with a Tj line plus four image XObjects: REAL JPEG via
    * DCTDecode, Flate-wrapped PNG container (the reference's
    * guessed-format branch, mod.rs:152-158), Flate raw DeviceGray
    * (our /ColorSpace extension), raw DeviceGray — FIXTURES.md
    * `pdf_with_images`. Images must not affect span output (parity
    * pin SURVEY.md §2.6.1). */
  def withImages(text: String): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.7\n%âãÏÓ\n")
    b.obj(1) { b.raw("<< /Type /Catalog /Pages 2 0 R >>") }
    b.obj(2) { b.raw("<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] >>") }
    b.obj(3) { b.raw("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    b.obj(4) {
      b.raw("<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources " +
        "<< /Font << /F1 3 0 R >> /XObject << /Im0 6 0 R /Im1 7 0 R /Im2 8 0 R /Im3 9 0 R >> >> >>")
    }
    val content = (tjLine(text) + " q 100 0 0 100 72 500 cm /Im0 Do Q" +
      " q 100 0 0 100 200 500 cm /Im1 Do Q q 8 0 0 8 320 500 cm /Im2 Do Q" +
      " q 8 0 0 8 400 500 cm /Im3 Do Q").getBytes(ISO_8859_1)
    b.streamObj(5, "", content)
    // DCT: REAL deterministic JPEG bytes (JDK encoder, fixed pattern)
    val dct = ImageCodec.encodeJpegRgb(8, 8, jpegPatternRgb)
    b.streamObj(6, "/Type /XObject /Subtype /Image /Width 8 /Height 8 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode", dct)
    // Flate gray 4x4
    val gray = Array.tabulate[Byte](16)(i => (i * 16).toByte)
    b.streamObj(7, "/Type /XObject /Subtype /Image /Width 4 /Height 4 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode", deflate(gray))
    // raw gray 2x2
    b.streamObj(8, "/Type /XObject /Subtype /Image /Width 2 /Height 2 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 8", Array[Byte](0, 64, -128, -1))
    // Flate-wrapped PNG container 2x3 (decodes via the guessed-format
    // branch, rotate90 → 3x2 output)
    val png = PdfImages.encodePng(2, 3, pngPatternRgba)
    b.streamObj(9, "/Type /XObject /Subtype /Image /Width 2 /Height 3 " +
      "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode", deflate(png))
    writeClassicXref(b)
  }

  /** One page embedding a CCITT G4 (T.6) bilevel image XObject — the
    * scanned-fax class the reference skips as "Unsupported filter"
    * (mod.rs:163-165) and we decode from spec ([[CcittFax]]). Payload
    * bytes come from the JDK's independent T.6 encoder. Pattern:
    * white iff (x + 2y) % 4 != 0, 10×6. */
  def withCcittImage(text: String = "fax doc"): Array[Byte] =
    withCcittImagePattern(10, 6, (x, y) => (x + 2 * y) % 4 != 0, text)

  /** [[withCcittImage]] with caller-supplied dims/pattern — the
    * parameterized fixture behind the `pdfz_images_fax` oracle query.
    * `k = -1` embeds a pure-T.6 payload; `k = 0` a byte-aligned 1-D MH
    * payload (both from the JDK's independent CCITT encoders). */
  def withCcittImagePattern(w: Int, h: Int, white: (Int, Int) => Boolean,
      text: String = "fax doc", k: Int = -1): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.7\n%âãÏÓ\n")
    b.obj(1) { b.raw("<< /Type /Catalog /Pages 2 0 R >>") }
    b.obj(2) { b.raw("<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] >>") }
    b.obj(3) { b.raw("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    b.obj(4) {
      b.raw("<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources " +
        "<< /Font << /F1 3 0 R >> /XObject << /Im0 6 0 R >> >> >>")
    }
    val content = (tjLine(text) + " q 100 0 0 60 72 500 cm /Im0 Do Q").getBytes(ISO_8859_1)
    b.streamObj(5, "", content)
    require(k == -1 || k == 0, "fixture supports K=-1 (T.6) and K=0 (1-D)")
    val payload =
      if (k < 0) ImageCodec.encodeCcittT6Bilevel(w, h, white)
      else ImageCodec.encodeCcittRleBilevel(w, h, white)
    val align = if (k == 0) " /EncodedByteAlign true" else ""
    b.streamObj(6, s"/Type /XObject /Subtype /Image /Width $w /Height $h " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /CCITTFaxDecode " +
      s"/DecodeParms << /K $k /Columns $w /Rows $h$align >>", payload)
    writeClassicXref(b)
  }

  /** One page embedding a JBIG2 bilevel image XObject (embedded
    * segment format: page info + one immediate generic region) — the
    * parameterized fixture behind the `pdfz_images_jbig2` oracle
    * query. `mmr = true` codes the region with the JDK's independent
    * T.6 encoder (MMR generic region); `mmr = false` with the
    * from-spec MQ arithmetic coder ([[Jbig2.encodeGeneric]],
    * template/TPGDON as given). `black(x, y)` = JBIG2 1-bits.
    * `declaredW`/`declaredH` override the image DICT's /Width /Height
    * (default: the bitmap dims) — the PDF-spec-governing dims a
    * conformant reader clips/pads the JBIG2 page output to. */
  def withJbig2ImagePattern(w: Int, h: Int, black: (Int, Int) => Boolean,
      text: String = "jbig2 doc", mmr: Boolean = false, template: Int = 0,
      tpgdon: Boolean = false, declaredW: Int = -1, declaredH: Int = -1): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.7\n%âãÏÓ\n")
    b.obj(1) { b.raw("<< /Type /Catalog /Pages 2 0 R >>") }
    b.obj(2) { b.raw("<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] >>") }
    b.obj(3) { b.raw("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    b.obj(4) {
      b.raw("<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources " +
        "<< /Font << /F1 3 0 R >> /XObject << /Im0 6 0 R >> >> >>")
    }
    val content = (tjLine(text) + " q 100 0 0 60 72 500 cm /Im0 Do Q").getBytes(ISO_8859_1)
    b.streamObj(5, "", content)
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) if (black(x, y)) px(y * w + x) = 1
    val payload = Jbig2.buildEmbedded(Jbig2.Bitmap(w, h, px), mmr, template, tpgdon)
    val dw = if (declaredW > 0) declaredW else w
    val dh = if (declaredH > 0) declaredH else h
    b.streamObj(6, s"/Type /XObject /Subtype /Image /Width $dw /Height $dh " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode", payload)
    writeClassicXref(b)
  }

  /** One page embedding a JBIG2 TEXT-region image XObject (symbol
    * dictionary + text region, the scanned-TEXT shape): glyphs g∈0..2
    * are (3+g)×(2+g) bitmaps black iff (x+y+g+seed)%2==0; `nInst`
    * instances place glyph i%3 at s=(i%4)*8, t=(i/4)*6 (TOPLEFT, OR,
    * non-overlapping) on a 32×18 page — every quantity is closed-form
    * so the oracle recomputes black counts analytically. */
  def withJbig2TextPattern(seed: Long, nInst: Int,
      text: String = "jbig2 text doc", huffman: Boolean = false,
      huffMmr: Boolean = false): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.7\n%âãÏÓ\n")
    b.obj(1) { b.raw("<< /Type /Catalog /Pages 2 0 R >>") }
    b.obj(2) { b.raw("<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] >>") }
    b.obj(3) { b.raw("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    b.obj(4) {
      b.raw("<< /Type /Page /Parent 2 0 R /Contents 5 0 R /Resources " +
        "<< /Font << /F1 3 0 R >> /XObject << /Im0 6 0 R >> >> >>")
    }
    val content = (tjLine(text) + " q 100 0 0 60 72 500 cm /Im0 Do Q").getBytes(ISO_8859_1)
    b.streamObj(5, "", content)
    val syms = (0 to 2).map { g =>
      val gw = 3 + g; val gh = 2 + g
      val px = new Array[Byte](gw * gh)
      for (y <- 0 until gh; x <- 0 until gw)
        if ((x + y + g + seed) % 2 == 0) px(y * gw + x) = 1
      Jbig2.Bitmap(gw, gh, px)
    }.toVector
    val instances = (0 until nInst).map(i =>
      Jbig2.TextInstance(i % 3, (i % 4) * 8, (i / 4) * 6))
    val payload =
      if (huffman) Jbig2.buildEmbeddedTextHuff(32, 18, syms, instances, mmr = huffMmr)
      else Jbig2.buildEmbeddedText(32, 18, syms, instances)
    b.streamObj(6, "/Type /XObject /Subtype /Image /Width 32 /Height 18 " +
      "/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode", payload)
    writeClassicXref(b)
  }

  /** Truncated-xref document for the fail-soft path. */
  def corrupt(): Array[Byte] = {
    val good = simple(Seq(tjLine("doomed")))
    val s = new String(good, ISO_8859_1)
    val cut = s.indexOf("xref")
    (s.substring(0, cut) + "startxref\n999999\n%%EOF\n").getBytes(ISO_8859_1)
  }
}
