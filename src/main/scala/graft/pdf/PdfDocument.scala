package graft.pdf

import scala.collection.mutable

/** From-scratch PDF document reader: xref table + xref-stream walk,
  * object-stream (/Type /ObjStm) decode, page-tree traversal — the
  * surface the reference reaches through `lopdf::Document::load` /
  * `get_pages` (/root/reference/extractor/src/engine/mod.rs:58,63,72),
  * re-implemented from ISO 32000-1 §7.5. No external parsing library.
  */
final class PdfDocument private (
    val buf: Array[Byte],
    entries: Map[Int, PdfDocument.XrefEntry],
    val trailer: PDict,
    password: Array[Byte]) {

  import PdfDocument._

  private val cache = mutable.HashMap.empty[Int, PdfObj]
  private val objStmCache = mutable.HashMap.empty[Int, Map[Int, PdfObj]]
  private val loading = mutable.HashSet.empty[Int] // cycle guard

  /** Font decoders memoized per font OBJECT for the document's
    * lifetime: fonts are shared across pages, but the decoder build
    * (ToUnicode CMap inflate + parse, or a 256-entry table with
    * /Differences applied) ran once per page before this cache — a
    * 32-page document re-inflated each font's ToUnicode stream 32
    * times. Keyed by instance identity: indirect fonts resolve to the
    * one cached [[PdfObj]], so identity is exact and cheaper than
    * structural equality; a (rare) direct font dict embedded per page
    * misses and just rebuilds, which is the pre-cache behavior.
    * Decoders are immutable; a document is driven by one task thread
    * (the fan-out path loads its own instance per chunk). */
  private[pdf] val fontDecoderCache =
    new java.util.IdentityHashMap[PDict, ContentText.FontDecoder]()

  /** Standard-security-handler decryption (ISO 32000-1 §7.6; empty
    * user password — [[PdfCrypt]]). Initialized EAGERLY so stream
    * parsing can consult it; while it is being built (resolving the
    * /Encrypt dict — a plain dict, which the spec forbids living in an
    * object stream) `cryptReady` is false and streams parse raw. A
    * non-empty-password or unsupported-scheme document throws the
    * declared [[PdfCrypt.PdfCryptException]] here, which document
    * loading surfaces fail-soft like any parse failure. */
  /** The /Encrypt dictionary's own object number: its strings (/O /U
    * /UE /OE /Perms) are NOT encrypted (§7.6.2) and must parse raw
    * even after the handler is live. -1 when direct or absent. */
  private val encryptObjNum: Int = trailer.get("Encrypt") match {
    case Some(PRef(n, _)) => n
    case _                => -1
  }

  private var cryptReady = false
  private val crypt: Option[PdfCrypt.StdSecurityHandler] = {
    val h = trailer.get("Encrypt") match {
      case None => None
      case Some(ref) =>
        val encDict = resolve(ref) match {
          case d: PDict => d
          case _ => throw new PdfParseException("/Encrypt is not a dictionary")
        }
        val id0 = resolve(trailer.get("ID").getOrElse(PNull)) match {
          case PArr(items) if items.nonEmpty => resolve(items.head) match {
            case PStr(bs) => bs
            case _ => Array.emptyByteArray
          }
          case _ => Array.emptyByteArray
        }
        Some(PdfCrypt.forDocument(encDict, id0, resolve, password))
    }
    cryptReady = true
    // objects resolved WHILE the handler was being built parsed raw
    // (cryptReady false) and were memoized; on an encrypted document a
    // hostile file could route /Encrypt or /ID resolution through an
    // object stream, leaving that ObjStm container cached undecrypted
    // — evict everything construction touched so post-init reads
    // re-parse with decryption (normally a fail-soft parse error, but
    // garbage must not stay cached)
    if (h.isDefined) { cache.clear(); objStmCache.clear() }
    h
  }

  /** True when the document has a standard-security handler. Both
    * stream payloads AND top-level strings decrypt (Algorithm 1), so
    * [[PdfMeta]] works on the encrypted class too. */
  def isEncrypted: Boolean = crypt.isDefined

  /** Algorithm 1 over every string nested in an indirect object's
    * body (§7.6.2: strings are encrypted with the same per-object
    * keys as streams). Streams are handled separately at slice time;
    * strings INSIDE object streams are already plaintext (the ObjStm
    * container decrypted as a stream) and never reach this. */
  private def decryptStrings(o: PdfObj, num: Int, gen: Int): PdfObj = o match {
    case PStr(b)   => PStr(crypt.get.decryptString(num, gen, b))
    case PArr(xs)  => PArr(xs.map(decryptStrings(_, num, gen)))
    case PDict(m)  => PDict(m.map { case (k, v) => k -> decryptStrings(v, num, gen) })
    case other     => other
  }

  def getObject(num: Int): PdfObj = cache.getOrElseUpdate(num, {
    if (!loading.add(num)) throw new PdfParseException(s"reference cycle at obj $num")
    try entries.get(num) match {
      case Some(Direct(offset)) => parseIndirectAt(offset, num)
      case Some(InStream(stm, idx)) =>
        objStmObjects(stm).getOrElse(idx, PNull)
      case _ => PNull
    } finally loading.remove(num)
  })

  /** Deref indirect references (transitively). */
  def resolve(o: PdfObj): PdfObj = o match {
    case PRef(n, _) => resolve(getObject(n))
    case x          => x
  }

  def dictGet(d: PDict, key: String): PdfObj = resolve(d.get(key).getOrElse(PNull))

  /** Decode a stream's payload through its filter chain. */
  def streamData(s: PStream): Either[String, Array[Byte]] =
    Filters.decode(s.dict, trimToLength(s), resolve)

  private def trimToLength(s: PStream): Array[Byte] = {
    val len = resolve(s.dict.get("Length").getOrElse(PNull)).asInt.map(_.toInt)
    len match {
      case Some(l) if l >= 0 && l < s.raw.length => s.raw.take(l)
      case _ => s.raw // exact length (the common case): no copy
    }
  }

  private def parseIndirectAt(offset: Int, expectNum: Int): PdfObj = {
    if (offset < 0 || offset >= buf.length)
      throw new PdfParseException(s"xref offset $offset out of range for obj $expectNum")
    val lx = new Lexer(buf, offset)
    lx.skipWs()
    val n = lx.parseObject().asInt.getOrElse(throw new PdfParseException(s"bad obj header at $offset"))
    val gen = lx.parseObject().asInt.getOrElse(0L).toInt
    lx.expectKeyword("obj")
    if (n != expectNum)
      throw new PdfParseException(s"xref points obj $expectNum at obj $n")
    val body = lx.parseObject()
    lx.skipWs()
    // the /Encrypt dictionary's own strings are never encrypted
    val decStr = cryptReady && crypt.isDefined && expectNum != encryptObjNum
    body match {
      case d: PDict if lx.peekKeyword("stream") =>
        lx.pos += "stream".length
        // EOL after 'stream': CRLF or LF (§7.3.8.1)
        if (lx.pos < buf.length && buf(lx.pos) == '\r') lx.pos += 1
        if (lx.pos < buf.length && buf(lx.pos) == '\n') lx.pos += 1
        val start = lx.pos
        val end = resolve(d.get("Length").getOrElse(PNull)).asInt match {
          case Some(l) if start + l <= buf.length &&
              endstreamFollows(start + l.toInt) => start + l.toInt
          case _ => findEndstream(start)
        }
        val raw0 = buf.slice(start, end)
        // decrypt stream payloads (the one place obj/gen are in hand);
        // xref streams are never encrypted (§7.5.8.2)
        val isXrefStream = d.get("Type").contains(PName("XRef"))
        if (isXrefStream) PStream(d, raw0)
        else {
          val dd =
            if (decStr) decryptStrings(d, expectNum, gen).asInstanceOf[PDict]
            else d
          val raw =
            if (cryptReady && crypt.isDefined)
              crypt.get.decryptStream(expectNum, gen, raw0)
            else raw0
          PStream(dd, raw)
        }
      case other =>
        if (decStr) decryptStrings(other, expectNum, gen) else other
    }
  }

  private def endstreamFollows(at: Int): Boolean = {
    var p = at
    while (p < buf.length && (buf(p) == '\r' || buf(p) == '\n' || buf(p) == ' ')) p += 1
    p + 9 <= buf.length &&
      new String(buf, p, 9, java.nio.charset.StandardCharsets.US_ASCII) == "endstream"
  }

  private def findEndstream(start: Int): Int = {
    val pat = "endstream".getBytes
    var p = start
    while (p <= buf.length - pat.length) {
      var i = 0
      while (i < pat.length && buf(p + i) == pat(i)) i += 1
      if (i == pat.length) {
        // back off trailing EOL before the keyword
        var e = p
        if (e > start && buf(e - 1) == '\n') e -= 1
        if (e > start && buf(e - 1) == '\r') e -= 1
        return e
      }
      p += 1
    }
    throw new PdfParseException("endstream not found")
  }

  /** Parse all objects packed in an object stream (§7.5.7). */
  private def objStmObjects(stmNum: Int): Map[Int, PdfObj] =
    objStmCache.getOrElseUpdate(stmNum, {
      getObject(stmNum) match {
        case s: PStream =>
          val data = streamData(s) match {
            case Right(d) => d
            case Left(f)  => throw new PdfParseException(s"ObjStm with opaque filter $f")
          }
          val n = resolve(s.dict.get("N").getOrElse(PNull)).asInt
            .getOrElse(throw new PdfParseException("ObjStm missing /N")).toInt
          val first = resolve(s.dict.get("First").getOrElse(PNull)).asInt
            .getOrElse(throw new PdfParseException("ObjStm missing /First")).toInt
          val hdr = new Lexer(data, 0)
          val pairs = (0 until n).map { _ =>
            val num = hdr.parseObject().asInt.getOrElse(0L).toInt
            val off = hdr.parseObject().asInt.getOrElse(0L).toInt
            (num, off)
          }
          pairs.zipWithIndex.map { case ((num, off), idx) =>
            val lx = new Lexer(data, first + off)
            idx -> lx.parseObject()
          }.toMap // keyed by index within the stream (xref type-2 field 3)
        case _ => throw new PdfParseException(s"obj $stmNum is not an ObjStm")
      }
    })

  // ---- page tree ----------------------------------------------------

  /** Leaf pages in document order, each with inheritable attributes
    * (/Resources /MediaBox /Rotate, §7.7.3.4) merged in. 1-based page
    * numbers follow from position (matching lopdf's BTreeMap order,
    * /root/reference/extractor/src/engine/mod.rs:72).
    */
  lazy val pages: Vector[PDict] = pagesWithNums.map(_._2)

  /** [[pages]] with each leaf's OBJECT NUMBER (-1 for a page written
    * inline in its parent's /Kids — non-conforming but parseable).
    * The number is the join key destinations and outline items use to
    * name a page (§12.3.2: a /Dest array's first element is a page
    * object reference). */
  lazy val pagesWithNums: Vector[(Int, PDict)] = {
    val root = dictGet(trailer, "Root") match {
      case d: PDict => d
      case _        => throw new PdfParseException("missing /Root catalog")
    }
    val top = dictGet(root, "Pages") match {
      case d: PDict => d
      case _        => throw new PdfParseException("missing /Pages")
    }
    val out = Vector.newBuilder[(Int, PDict)]
    val inheritable = Seq("Resources", "MediaBox", "Rotate", "CropBox")
    val seen = mutable.HashSet.empty[Int]
    def walk(node: PDict, num: Int, inherited: Map[String, PdfObj], depth: Int): Unit = {
      if (depth > 64) throw new PdfParseException("page tree too deep")
      val inh = inherited ++ inheritable.flatMap(k => node.get(k).map(k -> _))
      dictGet(node, "Type") match {
        case PName("Page") =>
          out += ((num, PDict((inh ++ node.m).toMap)))
        case _ =>
          dictGet(node, "Kids") match {
            case PArr(kids) =>
              kids.foreach { k =>
                val kidNum = k match {
                  case PRef(n, _) if !seen.add(n) =>
                    throw new PdfParseException("page tree cycle")
                  case PRef(n, _) => n
                  case _          => -1
                }
                resolve(k) match {
                  case kd: PDict => walk(kd, kidNum, inh, depth + 1)
                  case _         =>
                }
              }
            case _ => // intermediate node with no kids: nothing
          }
      }
    }
    walk(top, -1, Map.empty, 0)
    out.result()
  }

  def pageCount: Int = pages.length
}

object PdfDocument {

  sealed trait XrefEntry
  final case class Direct(offset: Int) extends XrefEntry
  final case class InStream(objStm: Int, idx: Int) extends XrefEntry

  /** Load a document: locate `startxref`, walk the xref chain
    * (classic tables and/or xref streams, /Prev links), merge
    * trailers (§7.5.4-7.5.8). */
  def load(bytes: Array[Byte]): PdfDocument =
    load(bytes, Array.emptyByteArray)

  /** Load with a user-or-owner password for encrypted documents
    * ([[PdfCrypt.forDocument]]; empty = the no-password class). */
  def load(bytes: Array[Byte], password: Array[Byte]): PdfDocument = {
    val sxOff = lastIndexOf(bytes, "startxref".getBytes,
      math.max(0, bytes.length - 2048))
    if (sxOff < 0) throw new PdfParseException("startxref not found")
    val lx = new Lexer(bytes, sxOff + "startxref".length)
    lx.skipWs()
    val firstXref = lx.parseObject().asInt
      .getOrElse(throw new PdfParseException("bad startxref offset")).toInt

    val entries = mutable.HashMap.empty[Int, XrefEntry]
    var trailer = Map.empty[String, PdfObj]
    val visited = mutable.HashSet.empty[Int]
    var next: Option[Int] = Some(firstXref)

    while (next.isDefined) {
      val off = next.get
      if (!visited.add(off)) next = None
      else {
        val (sectionEntries, sectionTrailer) = parseXrefSection(bytes, off)
        // earlier sections (parsed first) win — they are the newest
        sectionEntries.foreach { case (k, v) =>
          if (!entries.contains(k)) entries(k) = v
        }
        sectionTrailer.m.foreach { case (k, v) =>
          if (!trailer.contains(k)) trailer += (k -> v)
        }
        next = sectionTrailer.get("Prev").flatMap(_.asInt).map(_.toInt)
      }
    }
    new PdfDocument(bytes, entries.toMap, PDict(trailer), password)
  }

  /** One xref section at `off`: classic `xref` table or xref stream. */
  private def parseXrefSection(bytes: Array[Byte], off: Int): (Map[Int, XrefEntry], PDict) = {
    if (off < 0 || off >= bytes.length)
      throw new PdfParseException(s"xref offset $off out of range")
    val lx = new Lexer(bytes, off)
    lx.skipWs()
    if (lx.peekKeyword("xref")) {
      lx.pos += 4
      val entries = mutable.HashMap.empty[Int, XrefEntry]
      lx.skipWs()
      while (!lx.peekKeyword("trailer")) {
        val start = lx.parsePrimInt().toInt
        val count = lx.parsePrimInt().toInt
        var i = 0
        while (i < count) {
          val o = lx.parsePrimInt().toInt
          lx.parsePrimInt() // gen
          val kind = lx.readKeywordChar()
          if (kind == 'n') entries(start + i) = Direct(o)
          i += 1
        }
        lx.skipWs()
      }
      lx.pos += "trailer".length
      val tr = lx.parseObject() match {
        case d: PDict => d
        case _        => throw new PdfParseException("bad trailer dict")
      }
      (entries.toMap, tr)
    } else {
      // xref stream: "N G obj << /Type /XRef ... >> stream"
      lx.parseObject(); lx.parseObject() // num gen
      lx.expectKeyword("obj")
      val d = lx.parseObject() match {
        case dd: PDict => dd
        case _         => throw new PdfParseException("xref stream: dict expected")
      }
      lx.skipWs()
      lx.expectKeyword("stream")
      if (lx.pos < bytes.length && bytes(lx.pos) == '\r') lx.pos += 1
      if (lx.pos < bytes.length && bytes(lx.pos) == '\n') lx.pos += 1
      val len = d.get("Length").flatMap(_.asInt)
        .getOrElse(throw new PdfParseException("xref stream needs direct /Length")).toInt
      val raw = bytes.slice(lx.pos, lx.pos + len)
      val data = Filters.decode(d, raw, identity) match {
        case Right(x) => x
        case Left(f)  => throw new PdfParseException(s"xref stream opaque filter $f")
      }
      val w = d.get("W") match {
        case Some(PArr(xs)) => xs.flatMap(_.asInt).map(_.toInt)
        case _              => throw new PdfParseException("xref stream missing /W")
      }
      if (w.length < 3) throw new PdfParseException("xref /W needs 3 fields")
      val size = d.get("Size").flatMap(_.asInt).getOrElse(0L).toInt
      val index: Vector[(Int, Int)] = d.get("Index") match {
        case Some(PArr(xs)) =>
          xs.flatMap(_.asInt).map(_.toInt).grouped(2).collect { case Seq(a, b) => (a, b) }.toVector
        case _ => Vector((0, size))
      }
      val rowLen = w.sum
      val entries = mutable.HashMap.empty[Int, XrefEntry]
      var p = 0
      index.foreach { case (start, count) =>
        var i = 0
        while (i < count && p + rowLen <= data.length) {
          def field(k: Int): Long = {
            var v = 0L
            val base = p + w.take(k).sum
            var j = 0
            while (j < w(k)) { v = (v << 8) | (data(base + j) & 0xff); j += 1 }
            v
          }
          val t = if (w(0) == 0) 1L else field(0) // default type 1 (§7.5.8.3)
          val f2 = field(1); val f3 = field(2)
          t match {
            case 1 => entries(start + i) = Direct(f2.toInt)
            case 2 => entries(start + i) = InStream(f2.toInt, f3.toInt)
            case _ => // type 0 (free) or unknown: skip
          }
          p += rowLen
          i += 1
        }
      }
      (entries.toMap, d)
    }
  }

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var p = hay.length - needle.length
    while (p >= from) {
      var i = 0
      while (i < needle.length && hay(p + i) == needle(i)) i += 1
      if (i == needle.length) return p
      p -= 1
    }
    -1
  }
}
