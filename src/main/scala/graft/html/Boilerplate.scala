package graft.html

import scala.collection.mutable

/** HTML main-content extraction: DOM-lite tag tokenizer + boilerplate
  * classifier (north_rule "HTML boilerplate strip, DOM heuristics").
  *
  * The reference is PDF-only — this module's scope comes from
  * BASELINE.json `north_rule`; semantics are pinned by our fixtures
  * (FIXTURES.md §5) and follow the published boilerpipe-style
  * link-density heuristic (Kohlschütter et al., WSDM 2010):
  *
  *   - content inside nav/header/footer/aside/form/script/style/
  *     noscript/head/svg/button/template is stripped wholesale;
  *   - remaining text is segmented into blocks at block-level tags;
  *   - a block is kept iff its trimmed text is non-empty and its
  *     link density (chars inside <a> / total chars) ≤ 0.5;
  *   - <img src=...> outside stripped regions becomes a media span at
  *     its interleaved document position.
  */
object Boilerplate {

  /** One extracted piece, in document order. */
  sealed trait Piece
  final case class TextPiece(text: String) extends Piece
  final case class MediaPiece(src: String) extends Piece

  private val stripTags = Set("nav", "header", "footer", "aside", "form",
    "script", "style", "noscript", "head", "svg", "button", "template", "iframe")
  private val blockTags = Set("p", "div", "article", "section", "main", "body",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "table", "tr", "td",
    "blockquote", "pre", "br", "hr", "figure", "figcaption")

  private val entities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©", "reg" -> "®")

  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          if (name.startsWith("#x") || name.startsWith("#X")) {
            try { sb.appendCodePoint(Integer.parseInt(name.substring(2), 16)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (name.startsWith("#")) {
            try { sb.appendCodePoint(Integer.parseInt(name.substring(1))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else entities.get(name.toLowerCase) match {
            case Some(r) => sb.append(r); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Case-insensitive indexOf without copying/lowercasing the haystack
    * (the naive `html.toLowerCase.indexOf` re-copied the WHOLE document
    * for every raw-text element — quadratic on script-heavy pages). */
  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length; val m = target.length
    var i = math.max(0, from)
    while (i + m <= n) {
      if (s.regionMatches(true, i, target, 0, m)) return i
      i += 1
    }
    -1
  }

  private final case class Tag(name: String, closing: Boolean, selfClosing: Boolean,
      attrs: Map[String, String])

  /** Parse the tag starting at `<`; returns (tag, posAfter). Malformed
    * tags are treated as text (fail-soft). */
  private def parseTag(s: String, start: Int): Option[(Tag, Int)] = {
    var i = start + 1
    if (i >= s.length) return None
    // comments and doctype / CDATA
    if (s.startsWith("<!--", start)) {
      val end = s.indexOf("-->", start + 4)
      return Some((Tag("!--", closing = false, selfClosing = true, Map.empty),
        if (end < 0) s.length else end + 3))
    }
    if (s.charAt(i) == '!' || s.charAt(i) == '?') {
      val end = s.indexOf('>', i)
      return Some((Tag("!", closing = false, selfClosing = true, Map.empty),
        if (end < 0) s.length else end + 1))
    }
    val closing = s.charAt(i) == '/'
    if (closing) i += 1
    val nameStart = i
    while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
    if (i == nameStart) return None // "<" followed by junk: treat as text
    val name = s.substring(nameStart, i).toLowerCase
    val attrs = mutable.HashMap.empty[String, String]
    var selfClosing = false
    var done = false
    while (!done && i < s.length) {
      val c = s.charAt(i)
      if (c == '>') { done = true; i += 1 }
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '>') {
        selfClosing = true; done = true; i += 2
      } else if (c.isWhitespace) i += 1
      else {
        val aStart = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
          s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val aName = s.substring(aStart, i).toLowerCase
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i < s.length && s.charAt(i) == '=') {
          i += 1
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
          if (i < s.length && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val vStart = i
            while (i < s.length && s.charAt(i) != q) i += 1
            attrs(aName) = s.substring(vStart, math.min(i, s.length))
            if (i < s.length) i += 1
          } else {
            val vStart = i
            while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
            attrs(aName) = s.substring(vStart, i)
          }
        } else if (aName.nonEmpty) attrs(aName) = ""
        else i += 1
      }
    }
    Some((Tag(name, closing, selfClosing, attrs.toMap)), i).map { case (t, p) => (t, p) }
  }

  private val rawTextTags = Set("script", "style", "noscript", "template")

  /** THE tokenizer walk — the one automaton [[extract]] and [[links]]
    * both ride, so their strip-region accounting, raw-text (script/
    * style) consumption and comment skipping can never desynchronize.
    * `onTag(tag, stripDepthBefore, opensStrip)` fires for every
    * non-comment, non-raw-text tag (strip-depth bookkeeping itself
    * stays in here); `onText(char, stripDepth, failedTagParse)` fires
    * per text character (`failedTagParse` = a bare '<' that did not
    * parse as a tag — [[extract]] counts it differently, a pinned
    * quirk). */
  private def walkHtml(html: String)(
      onTag: (Tag, Int, Boolean) => Unit)(
      onText: (Char, Int, Boolean) => Unit): Unit = {
    var stripDepth = 0
    var rawUntil: String = null
    var i = 0
    while (i < html.length) {
      if (rawUntil != null) {
        // consume until matching close tag of a raw-text element
        val close = indexOfIgnoreCase(html, s"</$rawUntil", i)
        if (close < 0) i = html.length
        else {
          val gt = html.indexOf('>', close)
          i = if (gt < 0) html.length else gt + 1
        }
        rawUntil = null
      } else if (html.charAt(i) == '<') {
        parseTag(html, i) match {
          case Some((tag, next)) =>
            i = next
            tag.name match {
              case "!--" | "!" => // comment/doctype: skip
              case n if stripTags.contains(n) =>
                if (tag.closing) stripDepth = math.max(0, stripDepth - 1)
                else if (!tag.selfClosing) {
                  if (rawTextTags.contains(n)) rawUntil = n
                  else { onTag(tag, stripDepth, true); stripDepth += 1 }
                }
              case _ => onTag(tag, stripDepth, false)
            }
          case None =>
            onText(html.charAt(i), stripDepth, true)
            i += 1
        }
      } else {
        onText(html.charAt(i), stripDepth, false)
        i += 1
      }
    }
  }

  /** Extract ordered content pieces from raw HTML. */
  def extract(html: String): Vector[Piece] = {
    val out = Vector.newBuilder[Piece]
    val text = new java.lang.StringBuilder
    var linkChars = 0
    var totalChars = 0
    var linkDepth = 0

    def flushBlock(): Unit = {
      val t = normalizeWs(text.toString)
      if (t.nonEmpty) {
        val density = if (totalChars == 0) 0.0 else linkChars.toDouble / totalChars
        if (density <= 0.5) out += TextPiece(t)
      }
      text.setLength(0); linkChars = 0; totalChars = 0
    }

    walkHtml(html) { (tag, depth, opensStrip) =>
      if (opensStrip) flushBlock()
      else tag.name match {
        case "img" =>
          if (depth == 0) {
            flushBlock()
            tag.attrs.get("src").filter(_.nonEmpty).foreach(src => out += MediaPiece(src))
          }
        case "a" =>
          if (tag.closing) linkDepth = math.max(0, linkDepth - 1) else linkDepth += 1
        case n if blockTags.contains(n) =>
          if (depth == 0) flushBlock()
        case _ => // inline tag: no block boundary
      }
    } { (c, depth, failedTag) =>
      if (depth == 0) {
        text.append(c)
        if (failedTag) totalChars += 1 // a bare '<': counted, never link-weighted
        else if (!c.isWhitespace) {
          totalChars += 1
          if (linkDepth > 0) linkChars += 1
        }
      }
    }
    flushBlock()
    out.result()
  }

  /** One outbound link edge: href (verbatim attribute bytes), the
    * entity-decoded whitespace-normalized anchor text, and whether
    * the anchor sits inside a STRIPPED (boilerplate) region — the
    * label a link-graph pipeline weights nav/footer chrome down by. */
  final case class LinkEdge(href: String, anchor: String, boilerplate: Boolean)

  /** Extract every `<a href=…>` edge in document order — the HTML
    * analog of the PDF /Link /URI extraction ([[graft.pdf.PdfMeta]]):
    * the document→web edge set crawl-based corpora mine from anchors.
    * Same tokenizer and raw-text consumption as [[extract]] (an `<a>`
    * inside a script string is never an edge); anchors with an absent
    * or empty href are not edges; a new `<a>` before the previous one
    * closed flushes it (the browser auto-close rule). The boilerplate
    * flag is taken at the anchor's OPENING tag. */
  def links(html: String): Vector[LinkEdge] = {
    val out = Vector.newBuilder[LinkEdge]
    var openHref: String = null
    var openBoiler = false
    val anchor = new java.lang.StringBuilder
    def flush(): Unit = {
      if (openHref != null) {
        out += LinkEdge(openHref, normalizeWs(anchor.toString), openBoiler)
        openHref = null
      }
      anchor.setLength(0)
    }
    walkHtml(html) { (tag, depth, opensStrip) =>
      if (!opensStrip && tag.name == "a") {
        if (tag.closing) flush()
        else {
          flush() // auto-close a dangling anchor
          tag.attrs.get("href").filter(_.nonEmpty).foreach { h =>
            openHref = h
            openBoiler = depth > 0
          }
        }
      }
    } { (c, _, _) =>
      if (openHref != null) anchor.append(c)
    }
    flush()
    out.result()
  }

  def normalizeWs(s: String): String = {
    val decoded = decodeEntities(s)
    val sb = new java.lang.StringBuilder(decoded.length)
    var lastWs = true
    decoded.foreach { c =>
      if (c.isWhitespace) { if (!lastWs) sb.append(' '); lastWs = true }
      else { sb.append(c); lastWs = false }
    }
    val r = sb.toString
    if (r.endsWith(" ")) r.substring(0, r.length - 1) else r
  }
}
