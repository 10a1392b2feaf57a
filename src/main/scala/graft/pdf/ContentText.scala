package graft.pdf

import scala.collection.mutable

/** Content-stream text extraction (ISO 32000-1 §9): BT/ET, Tf, the
  * positioning family (Td, TD, T-star, TL, Tm), and the show operators
  * (Tj, TJ, quote, double-quote), with ToUnicode-CMap and base-encoding + /Differences
  * byte→char decode. Replaces what the reference gets from
  * `lopdf::Document::extract_text`
  * (/root/reference/extractor/src/engine/mod.rs:100-103) — rebuilt
  * from the spec, not translated.
  *
  * Line-reassembly pin (SURVEY.md §2.6.4, §7.4.1 — our oracle is
  * by-construction fixtures): a newline is emitted before a show
  * operation iff some text was already shown on the page AND the text
  * line's vertical position changed since the previous show. TJ
  * kerning numbers insert nothing. Multiple /Contents streams are
  * concatenated with a newline.
  */
object ContentText {

  // ---- glyph-name → char (Adobe Glyph List subset) -------------------
  private val aglBase: Map[String, Char] = {
    val m = mutable.HashMap.empty[String, Char]
    val asciiNames = Vector(
      "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
      "ampersand", "quotesingle", "parenleft", "parenright", "asterisk",
      "plus", "comma", "hyphen", "period", "slash", "zero", "one", "two",
      "three", "four", "five", "six", "seven", "eight", "nine", "colon",
      "semicolon", "less", "equal", "greater", "question", "at")
    asciiNames.zipWithIndex.foreach { case (n, i) => m(n) = (32 + i).toChar }
    ('A' to 'Z').foreach(c => m(c.toString) = c)
    m("bracketleft") = '['; m("backslash") = '\\'; m("bracketright") = ']'
    m("asciicircum") = '^'; m("underscore") = '_'; m("grave") = '`'
    ('a' to 'z').foreach(c => m(c.toString) = c)
    m("braceleft") = '{'; m("bar") = '|'; m("braceright") = '}'
    m("asciitilde") = '~'
    // common Latin-1 + punctuation glyphs
    m("quoteleft") = '‘'; m("quoteright") = '’'
    m("quotedblleft") = '“'; m("quotedblright") = '”'
    m("endash") = '–'; m("emdash") = '—'; m("bullet") = '•'
    m("eacute") = 'é'; m("egrave") = 'è'; m("agrave") = 'à'; m("ccedilla") = 'ç'
    m("adieresis") = 'ä'; m("odieresis") = 'ö'; m("udieresis") = 'ü'
    m("Adieresis") = 'Ä'; m("Odieresis") = 'Ö'; m("Udieresis") = 'Ü'
    m("germandbls") = 'ß'; m("ntilde") = 'ñ'; m("oslash") = 'ø'
    m("aring") = 'å'; m("ae") = 'æ'; m("copyright") = '©'; m("registered") = '®'
    m("degree") = '°'; m("euro") = '€'
    m.toMap
  }

  /** Resolve a glyph name: AGL subset, then uniXXXX / uXXXX forms. */
  def glyphToChar(name: String): Option[Char] =
    aglBase.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7)
        try Some(Integer.parseInt(name.substring(3, 7), 16).toChar) catch { case _: Exception => None }
      else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
        try Some(Integer.parseInt(name.substring(1), 16).toChar) catch { case _: Exception => None }
      else None
    }

  /** 256-entry byte→string tables. Base for Standard/WinAnsi/MacRoman:
    * ASCII identity over 0x20-0x7E (identical across those encodings
    * for the printable ASCII range, spec Annex D) plus the common
    * WinAnsi high range. */
  private def buildBaseTable(encoding: String): Array[String] = {
    val t = Array.fill[String](256)("")
    (0x20 to 0x7e).foreach(i => t(i) = i.toChar.toString)
    if (encoding == "WinAnsiEncoding") {
      val hi = Map(
        0x91 -> '‘', 0x92 -> '’', 0x93 -> '“', 0x94 -> '”',
        0x95 -> '•', 0x96 -> '–', 0x97 -> '—', 0x80 -> '€',
        0xa9 -> '©', 0xae -> '®', 0xb0 -> '°')
      hi.foreach { case (i, c) => t(i) = c.toString }
      (0xc0 to 0xff).foreach(i => t(i) = i.toChar.toString) // Latin-1 block
    }
    t
  }

  // tables are immutable in practice (Differences clones before edit) —
  // build each once; a fresh 256-String table per page was a measurable
  // allocation hot spot on multi-thousand-page corpora
  private val stdTable = buildBaseTable("StandardEncoding")
  private val winTable = buildBaseTable("WinAnsiEncoding")
  private def baseTable(encoding: String): Array[String] =
    if (encoding == "WinAnsiEncoding") winTable else stdTable

  /** Shared default decoder (table is never mutated). */
  private val stdDecoder = TableDecoder(stdTable)

  sealed trait FontDecoder { def decode(bytes: Array[Byte]): String }

  /** Simple (1-byte) font via a 256-entry table. */
  final case class TableDecoder(table: Array[String]) extends FontDecoder {
    def decode(bytes: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder(bytes.length)
      bytes.foreach(b => sb.append(table(b & 0xff)))
      sb.toString
    }
  }

  /** CMap-driven decoder (ToUnicode); codes are 1 or 2 bytes wide. */
  final case class CMapDecoder(bytesPerCode: Int, map: Map[Int, String], fallback: Array[String])
      extends FontDecoder {
    def decode(bytes: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i + bytesPerCode <= bytes.length) {
        var code = 0
        var j = 0
        while (j < bytesPerCode) { code = (code << 8) | (bytes(i + j) & 0xff); j += 1 }
        map.get(code) match {
          case Some(s) => sb.append(s)
          case None    => if (bytesPerCode == 1) sb.append(fallback(code))
        }
        i += bytesPerCode
      }
      sb.toString
    }
  }

  /** Parse a ToUnicode CMap stream (§9.10.3): codespacerange width,
    * bfchar and bfrange (scalar-dst and array-dst forms). */
  def parseToUnicode(data: Array[Byte]): CMapDecoder = {
    val toks = new Lexer(data, 0).tokenizeContent()
    var width = 1
    val map = mutable.HashMap.empty[Int, String]
    def codeOf(s: PStr): Int = s.bytes.foldLeft(0)((a, b) => (a << 8) | (b & 0xff))
    def utf16(s: PStr): String = new String(s.bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case POp("begincodespacerange") =>
          var j = i + 1
          while (j < toks.length && toks(j) != POp("endcodespacerange")) {
            toks(j) match { case s: PStr => width = math.max(width, s.bytes.length); case _ => }
            j += 1
          }
          i = j
        case POp("beginbfchar") =>
          var j = i + 1
          while (j + 1 < toks.length && toks(j) != POp("endbfchar")) {
            (toks(j), toks(j + 1)) match {
              case (src: PStr, dst: PStr) => map(codeOf(src)) = utf16(dst); j += 2
              case _                      => j += 1
            }
          }
          i = j
        case POp("beginbfrange") =>
          var j = i + 1
          while (j + 2 < toks.length && toks(j) != POp("endbfrange")) {
            (toks(j), toks(j + 1), toks(j + 2)) match {
              case (lo: PStr, hi: PStr, dst: PStr) =>
                val l = codeOf(lo); val h = codeOf(hi)
                val base = utf16(dst)
                if (base.nonEmpty) {
                  var c = l
                  while (c <= h && c - l < 65536) {
                    val last = (base.last + (c - l)).toChar
                    map(c) = base.dropRight(1) + last
                    c += 1
                  }
                }
                j += 3
              case (lo: PStr, _: PStr, PArr(dsts)) =>
                val l = codeOf(lo)
                dsts.zipWithIndex.foreach {
                  case (s: PStr, k) => map(l + k) = utf16(s)
                  case _            =>
                }
                j += 3
              case _ => j += 1
            }
          }
          i = j
        case _ =>
      }
      i += 1
    }
    CMapDecoder(width, map.toMap, baseTable("StandardEncoding"))
  }

  /** Build the decoder for one font dict (§9.6.6): ToUnicode first,
    * else base encoding + /Differences, else Standard ASCII table. */
  def fontDecoder(doc: PdfDocument, font: PDict): FontDecoder = {
    doc.dictGet(font, "ToUnicode") match {
      case s: PStream =>
        doc.streamData(s) match {
          case Right(d) => return parseToUnicode(d)
          case Left(_)  => // fall through
        }
      case _ =>
    }
    doc.dictGet(font, "Encoding") match {
      case PName(enc) => TableDecoder(baseTable(enc))
      case ed: PDict =>
        val base = doc.dictGet(ed, "BaseEncoding") match {
          case PName(b) => baseTable(b)
          case _        => baseTable("StandardEncoding")
        }
        val t = base.clone()
        doc.dictGet(ed, "Differences") match {
          case PArr(items) =>
            var code = 0
            items.foreach {
              case PInt(v)   => code = v.toInt
              case PName(g)  =>
                if (code >= 0 && code < 256)
                  t(code) = glyphToChar(g).map(_.toString).getOrElse("")
                code += 1
              case _ =>
            }
          case _ =>
        }
        TableDecoder(t)
      case _ => stdDecoder
    }
  }

  /** Extract the text of one page per the pinned reassembly rule. */
  def extractPageText(doc: PdfDocument, page: PDict): String = {
    val streams: Vector[Array[Byte]] = doc.dictGet(page, "Contents") match {
      case s: PStream => Vector(doc.streamData(s).getOrElse(Array.emptyByteArray))
      case PArr(xs) =>
        xs.map(doc.resolve).collect {
          case s: PStream => doc.streamData(s).getOrElse(Array.emptyByteArray)
        }
      case _ => Vector.empty
    }
    if (streams.isEmpty) return ""
    val content =
      if (streams.length == 1) streams.head
      else {
        // §7.8.2: the division between streams is a token boundary
        val total = streams.map(_.length).sum + streams.length - 1
        val out = new Array[Byte](total)
        var p = 0
        streams.zipWithIndex.foreach { case (s, i) =>
          if (i > 0) { out(p) = '\n'; p += 1 }
          System.arraycopy(s, 0, out, p, s.length); p += s.length
        }
        out
      }

    // font name → decoder, resolved lazily from /Resources /Font
    val fontDict: Map[String, PdfObj] = doc.dictGet(page, "Resources") match {
      case r: PDict => doc.dictGet(r, "Font") match {
        case f: PDict => f.m
        case _        => Map.empty
      }
      case _ => Map.empty
    }
    val decoders = mutable.HashMap.empty[String, FontDecoder]
    def decoderFor(name: String): FontDecoder =
      decoders.getOrElseUpdate(name, fontDict.get(name).map(doc.resolve) match {
        case Some(f: PDict) => fontDecoder(doc, f)
        case _              => stdDecoder
      })

    val toks = new Lexer(content, 0).tokenizeContent()
    val sb = new java.lang.StringBuilder
    var curFont = ""
    var leading = 0.0
    var lineY = 0.0
    var lastShowY = 0.0
    var hasShown = false
    val operands = mutable.ArrayBuffer.empty[PdfObj]

    def show(text: String): Unit = {
      if (text.nonEmpty) {
        if (hasShown && lineY != lastShowY) sb.append('\n')
        sb.append(text)
        hasShown = true
        lastShowY = lineY
      }
    }
    def dec(s: PStr): String = decoderFor(curFont).decode(s.bytes)
    def num(o: PdfObj): Double = o.asNum.getOrElse(0.0)

    toks.foreach {
      case op: POp =>
        op.op match {
          case "BT" => lineY = 0.0
          case "ET" =>
          case "Tf" => operands.headOption.foreach { case PName(n) => curFont = n; case _ => () }
          case "TL" => if (operands.nonEmpty) leading = num(operands(0))
          case "Td" => if (operands.length >= 2) lineY += num(operands(1))
          case "TD" => if (operands.length >= 2) { leading = -num(operands(1)); lineY += num(operands(1)) }
          case "Tm" => if (operands.length >= 6) lineY = num(operands(5))
          case "T*" => lineY -= leading
          case "Tj" => operands.headOption.foreach { case s: PStr => show(dec(s)); case _ => () }
          case "'" =>
            lineY -= leading
            operands.headOption.foreach { case s: PStr => show(dec(s)); case _ => () }
          case "\"" =>
            lineY -= leading
            operands.lastOption.foreach { case s: PStr => show(dec(s)); case _ => () }
          case "TJ" =>
            operands.headOption.foreach {
              case PArr(items) =>
                val text = items.collect { case s: PStr => dec(s) }.mkString // numbers: no space (pin)
                show(text)
              case _ => ()
            }
          case _ => // graphics / color / marked-content operators: ignored
        }
        operands.clear()
      case operand => operands += operand
    }
    sb.toString
  }

  /** Enumerate image XObjects of a page in /Resources declaration
    * order (sorted by name for determinism). Mirrors what the
    * reference walks via `get_page_images`
    * (/root/reference/extractor/src/engine/mod.rs:105-108); per parity
    * pin SURVEY.md §2.6.1 these never reach the span output — used for
    * metrics and non-parity media accounting only. */
  def pageImageNames(doc: PdfDocument, page: PDict): Vector[String] =
    pageImageObjects(doc, page).map(_._1)

  /** Image XObjects of a page, (resource name, stream), in stable
    * name order — the enumeration `get_page_images` exposes to the
    * reference's image loop (engine/mod.rs:105-107). */
  def pageImageObjects(doc: PdfDocument, page: PDict): Vector[(String, PStream)] = {
    doc.dictGet(page, "Resources") match {
      case r: PDict => doc.dictGet(r, "XObject") match {
        case x: PDict =>
          x.m.toVector.sortBy(_._1).flatMap { case (name, ref) =>
            doc.resolve(ref) match {
              case s: PStream if doc.dictGet(s.dict, "Subtype") == PName("Image") =>
                Some(name -> s)
              case _ => None
            }
          }
        case _ => Vector.empty
      }
      case _ => Vector.empty
    }
  }
}
