package graft.pdf

/** Document-information metadata and link-annotation extraction — a
  * DECLARED EXTENSION over the reference's surface (its lopdf
  * `extract_text` path, /root/reference/extractor/src/engine/mod.rs:100-103,
  * reads page text only; no /Info or /Annots access anywhere in the
  * extractor). Written from the public spec: ISO 32000-1 §14.3.3
  * (document information dictionary), §7.9.2.2 (text string type:
  * UTF-16BE when the FE FF byte-order mark leads, PDFDocEncoding
  * otherwise), §12.5.6.5 (link annotations), §12.6.4.7 (URI actions).
  *
  * Both surfaces matter to a training-data pipeline: /Info carries the
  * provenance columns (producer toolchain, creation date) corpus
  * curation filters on, and /Link /URI actions are the document→web
  * edge set — the link-graph signal crawl-based corpora get from HTML
  * anchors.
  *
  * Encrypted documents work like plain ones: [[PdfDocument]] decrypts
  * top-level strings (Algorithm 1, via V4's /StrF or R6's file key) at
  * parse time, so /Info, /URI, bookmark titles, form values and page-
  * label prefixes all surface as plaintext on the encrypted class. */
object PdfMeta {

  final case class DocInfo(
      title: Option[String], author: Option[String],
      subject: Option[String], keywords: Option[String],
      producer: Option[String], creationDate: Option[String])

  /** §7.9.2.2 text string: UTF-16BE when the two-byte BOM leads, else
    * PDFDocEncoding (Annex D.3) with undefined codes surfacing as
    * U+FFFD — the same never-silent-drop posture as the content-text
    * decoders. */
  def decodeTextString(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else {
      val sb = new StringBuilder(bytes.length)
      bytes.foreach { b =>
        val s = Encodings.pdfDoc(b & 0xff)
        sb.append(if (s.isEmpty) "\uFFFD" else s)
      }
      sb.toString
    }

  /** The trailer /Info dictionary's standard text-string entries
    * (§14.3.3, Table 317). Missing dict or entries → None; dates are
    * returned verbatim (the `D:YYYYMMDDHHmmSS` ASCII form is its own
    * exchange format, §7.9.4). */
  def info(doc: PdfDocument): DocInfo = {
    val d = doc.dictGet(doc.trailer, "Info") match {
      case pd: PDict => pd
      case _         => PDict(Map.empty)
    }
    def str(k: String): Option[String] = doc.dictGet(d, k) match {
      case PStr(bs) => Some(decodeTextString(bs))
      case _        => None
    }
    DocInfo(str("Title"), str("Author"), str("Subject"), str("Keywords"),
      str("Producer"), str("CreationDate"))
  }

  /** One extracted link: 0-based page, min/max-normalized /Rect
    * corners (§12.5.2 — conforming writers may emit either corner
    * order), and the action URI. */
  final case class Link(page: Int, x0: Double, y0: Double,
      x1: Double, y1: Double, uri: String)

  /** Every /Subtype /Link annotation carrying a /A /S /URI action,
    * page order then annotation-array order. Links whose action is
    * not a URI (GoTo, named destinations) and non-link annotations
    * (text notes, highlights) are skipped — declared scope: the
    * outbound web-edge set. URI bytes are 7-bit ASCII by §12.6.4.7
    * (writers percent-encode beyond ASCII), read as Latin-1. */
  def links(doc: PdfDocument): Vector[Link] = {
    doc.pages.iterator.zipWithIndex.flatMap { case (pg, idx) =>
      val annots = doc.dictGet(pg, "Annots") match {
        case PArr(items) => items
        case _           => Vector.empty
      }
      annots.flatMap { a =>
        doc.resolve(a) match {
          case ad: PDict if doc.dictGet(ad, "Subtype") == PName("Link") =>
            uriOf(doc, ad).map { u =>
              val (x0, y0, x1, y1) = rectOf(doc, ad)
              Link(idx, x0, y0, x1, y1, u)
            }
          case _ => None
        }
      }
    }.toVector
  }

  /** One document-outline (bookmark) item in pre-order: position,
    * nesting level, decoded title, and the 0-based page its
    * destination names (-1 when the destination is absent, named, or
    * not a page in this document). */
  final case class OutlineItem(ord: Int, level: Int, title: String, page: Int)

  /** The document outline tree (§12.3.3), flattened pre-order: each
    * item's /Title (a §7.9.2.2 text string), nesting level, and
    * destination page resolved through /Dest — or through an /A /GoTo
    * action's /D (§12.6.4.2) — by matching the destination array's
    * leading page reference against the page tree. NAMED destinations
    * resolve too (§12.3.2.3): a name object through the catalog's
    * PDF-1.1 /Dests dictionary, a byte string through the /Names
    * /Dests name tree (§7.9.6 — /Kids walked with /Limits pruning);
    * either value form unwraps (a plain dest array, or a dict whose
    * /D holds it). A name absent from both maps is -1, never a guess.
    * Siblings follow /Next from /First; a /First//Next reference seen
    * twice is a declared parse error (same cycle posture as the
    * page-tree walk), as is a tree deeper than 64 levels. */
  def outline(doc: PdfDocument): Vector[OutlineItem] = {
    val root = doc.dictGet(doc.trailer, "Root") match {
      case d: PDict => d
      case _        => return Vector.empty
    }
    val top = doc.dictGet(root, "Outlines") match {
      case d: PDict => d
      case _        => return Vector.empty
    }
    val pageIdx: Map[Int, Int] = doc.pagesWithNums.zipWithIndex
      .collect { case ((n, _), i) if n >= 0 => n -> i }.toMap
    val out = Vector.newBuilder[OutlineItem]
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var ord = 0
    // a named destination's VALUE may be the dest array itself or a
    // dict carrying it under /D (§12.3.2.3)
    def unwrapDest(v: PdfObj): Option[PArr] = doc.resolve(v) match {
      case a: PArr  => Some(a)
      case d: PDict => doc.dictGet(d, "D") match {
        case a: PArr => Some(a)
        case _       => None
      }
      case _ => None
    }
    def namedDest(bs: Array[Byte]): Option[PArr] =
      doc.dictGet(root, "Names") match {
        case nd: PDict => doc.dictGet(nd, "Dests") match {
          case tree: PDict => lookupNameTree(doc, tree, bs, 0).flatMap(unwrapDest)
          case _           => None
        }
        case _ => None
      }
    def destPage(item: PDict): Int = {
      val rawDest = doc.dictGet(item, "Dest") match {
        case PNull => doc.dictGet(item, "A") match {
          case act: PDict if doc.dictGet(act, "S") == PName("GoTo") =>
            doc.dictGet(act, "D")
          case _ => PNull
        }
        case other => other
      }
      val dest: Option[PArr] = rawDest match {
        case a: PArr    => Some(a)
        case PStr(bs)   => namedDest(bs)
        case PName(nm)  => doc.dictGet(root, "Dests") match {
          case dd: PDict => dd.get(nm).flatMap(unwrapDest)
          case _         => None
        }
        case _ => None
      }
      dest.flatMap(_.items.headOption) match {
        case Some(PRef(n, _)) => pageIdx.getOrElse(n, -1)
        case _                => -1
      }
    }
    def guard(raw: Option[PdfObj]): Unit = raw match {
      case Some(PRef(n, _)) if !seen.add(n) =>
        throw new PdfParseException("outline cycle")
      case _ =>
    }
    def walkChain(first: PdfObj, level: Int): Unit = {
      if (level > 64) throw new PdfParseException("outline too deep")
      var cur = doc.resolve(first)
      var steps = 0
      while (cur.isInstanceOf[PDict]) {
        steps += 1
        if (steps > 65536) throw new PdfParseException("outline chain too long")
        val d = cur.asInstanceOf[PDict]
        val title = doc.dictGet(d, "Title") match {
          case PStr(bs) => decodeTextString(bs)
          case _        => ""
        }
        out += OutlineItem(ord, level, title, destPage(d))
        ord += 1
        d.get("First").foreach { f =>
          guard(Some(f))
          walkChain(f, level + 1)
        }
        guard(d.get("Next"))
        cur = d.get("Next").map(doc.resolve).getOrElse(PNull)
      }
    }
    top.get("First").foreach { f => guard(Some(f)); walkChain(f, 0) }
    out.result()
  }

  /** NAME-TREE lookup (§7.9.6): a node holds either /Names (a flat
    * sorted [key value key value …] leaf) or /Kids; /Limits [lo hi]
    * prunes subtrees that cannot hold the key. Keys compare as
    * unsigned byte strings. Depth-guarded like every other tree walk. */
  private def lookupNameTree(doc: PdfDocument, node: PDict,
      key: Array[Byte], depth: Int): Option[PdfObj] = {
    if (depth > 32) throw new PdfParseException("name tree too deep")
    def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    doc.dictGet(node, "Names") match {
      case PArr(items) =>
        items.grouped(2).foreach {
          case Vector(k, v) => doc.resolve(k) match {
            case PStr(bs) if cmp(bs, key) == 0 => return Some(v)
            case _ =>
          }
          case _ =>
        }
        None
      case _ => doc.dictGet(node, "Kids") match {
        case PArr(kids) =>
          kids.foreach { kid =>
            doc.resolve(kid) match {
              case kd: PDict =>
                val inRange = doc.dictGet(kd, "Limits") match {
                  case PArr(Vector(lo, hi)) =>
                    (doc.resolve(lo), doc.resolve(hi)) match {
                      case (PStr(l), PStr(h)) =>
                        cmp(key, l) >= 0 && cmp(key, h) <= 0
                      case _ => true // malformed limits: search anyway
                    }
                  case _ => true
                }
                if (inRange) {
                  val hit = lookupNameTree(doc, kd, key, depth + 1)
                  if (hit.isDefined) return hit
                }
              case _ =>
            }
          }
          None
        case _ => None
      }
    }
  }

  /** One terminal interactive-form field: emission order, fully
    * qualified name (ancestor partial names joined with '.'), field
    * type and current value (None when neither the field nor an
    * ancestor carries /V). */
  final case class FormField(ord: Int, name: String, ft: String,
      value: Option[String])

  /** AcroForm field extraction (§12.7): walk the catalog's /AcroForm
    * /Fields tree pre-order and emit every TERMINAL field (a field
    * none of whose /Kids are themselves fields — kids without /T are
    * widget annotations, presentation only, skipped by §12.7.4.3).
    * /FT and /V are inheritable (§12.7.4.1 Table 220): a terminal
    * field missing them takes the nearest ancestor's. Values decode
    * per type: text strings through [[decodeTextString]], name values
    * (radio/checkbox states) as `/Name`. A field with no /FT anywhere
    * in its chain is skipped (not a renderable field class we can
    * type), never a guess. Same guards as [[outline]]. */
  def formFields(doc: PdfDocument): Vector[FormField] = {
    val root = doc.dictGet(doc.trailer, "Root") match {
      case d: PDict => d
      case _        => return Vector.empty
    }
    val acro = doc.dictGet(root, "AcroForm") match {
      case d: PDict => d
      case _        => return Vector.empty
    }
    val fields = doc.dictGet(acro, "Fields") match {
      case PArr(items) => items
      case _           => return Vector.empty
    }
    val out = Vector.newBuilder[FormField]
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var ord = 0
    def guard(o: PdfObj): Unit = o match {
      case PRef(n, _) if !seen.add(n) =>
        throw new PdfParseException("form field cycle")
      case _ =>
    }
    def isField(o: PdfObj): Boolean = doc.resolve(o) match {
      case d: PDict => d.get("T").isDefined
      case _        => false
    }
    def walk(o: PdfObj, prefix: String, inhFt: Option[String],
        inhV: Option[String], depth: Int): Unit = {
      if (depth > 32) throw new PdfParseException("form tree too deep")
      val d = doc.resolve(o) match {
        case pd: PDict => pd
        case _         => return
      }
      val name = doc.dictGet(d, "T") match {
        case PStr(bs) => decodeTextString(bs)
        case _        => ""
      }
      val full = if (prefix.isEmpty) name else s"$prefix.$name"
      val ft = doc.dictGet(d, "FT") match {
        case PName(n) => Some(n)
        case _        => inhFt
      }
      val v = doc.dictGet(d, "V") match {
        case PStr(bs) => Some(decodeTextString(bs))
        case PName(n) => Some(s"/$n")
        case _        => inhV
      }
      val childFields = d.get("Kids") match {
        case Some(k) => doc.resolve(k) match {
          case PArr(items) => items.filter(isField)
          case _           => Vector.empty
        }
        case None => Vector.empty
      }
      if (childFields.isEmpty) {
        ft.foreach { t => out += FormField(ord, full, t, v); ord += 1 }
      } else childFields.foreach { c =>
        guard(c)
        walk(c, full, ft, v, depth + 1)
      }
    }
    fields.foreach { f => guard(f); walk(f, "", None, None, 0) }
    out.result()
  }

  /** PAGE LABELS (§12.4.2): the per-page display labels a viewer
    * shows instead of raw indexes ("iv", "A-7"). The catalog's
    * /PageLabels NUMBER TREE (§7.9.7 — flat /Nums leaves or a
    * /Kids-split tree, recursed depth-guarded) maps starting page
    * indexes to label dictionaries: /S numbering style (D decimal,
    * r/R roman, a/A letters — Table 159), /P prefix (a §7.9.2.2 text
    * string), /St range start (default 1). Each page takes the range
    * with the largest key ≤ its index; its number is St + (index −
    * key); a range with no /S shows the prefix alone. No /PageLabels
    * → empty (the viewer default of decimal indexes is implicit, not
    * data). */
  def pageLabels(doc: PdfDocument): Vector[(Int, String)] = {
    val root = doc.dictGet(doc.trailer, "Root") match {
      case d: PDict => d
      case _        => return Vector.empty
    }
    val pl = doc.dictGet(root, "PageLabels") match {
      case d: PDict => d
      case _        => return Vector.empty
    }
    val ranges = numberTreePairs(doc, pl, 0).sortBy(_._1)
    if (ranges.isEmpty) return Vector.empty
    // §12.4.2 mandates a range at page index 0; a tree missing it
    // would make early pages' labels a guess — declared error instead
    if (ranges.head._1 != 0)
      throw new PdfParseException("PageLabels tree missing the page-0 range")
    (0 until doc.pageCount).map { idx =>
      val (key, d) = ranges.takeWhile(_._1 <= idx).last
      val st = doc.dictGet(d, "St") match {
        case PInt(s) if s >= 1 => s.toInt
        case _                 => 1
      }
      val n = st + math.max(0, idx - key)
      val prefix = doc.dictGet(d, "P") match {
        case PStr(bs) => decodeTextString(bs)
        case _        => ""
      }
      val num = doc.dictGet(d, "S") match {
        case PName("D") => n.toString
        case PName("r") => roman(n)
        case PName("R") => roman(n).toUpperCase(java.util.Locale.ROOT)
        case PName("a") => letters(n)
        case PName("A") => letters(n).toUpperCase(java.util.Locale.ROOT)
        case PName(other) => // an unknown style must not silently degrade
          throw new PdfParseException(s"unknown page-label style /$other")
        case _ => "" // no /S: prefix only (valid per Table 159)
      }
      (idx, prefix + num)
    }.toVector
  }

  /** NUMBER-TREE flatten (§7.9.7): collect every (integer key, value
    * dict) pair from /Nums leaves, recursing /Kids nodes. Lookup here
    * is whole-tree (page labels need every range anyway), so /Limits
    * are not consulted; depth and reference cycles are guarded by the
    * depth cap. */
  private def numberTreePairs(doc: PdfDocument, node: PDict,
      depth: Int): Vector[(Int, PDict)] = {
    if (depth > 32) throw new PdfParseException("number tree too deep")
    val own = doc.dictGet(node, "Nums") match {
      case PArr(items) => items.grouped(2).flatMap {
        case Vector(k, v) =>
          (doc.resolve(k), doc.resolve(v)) match {
            case (PInt(key), d: PDict) => Some((key.toInt, d))
            case _                     => None
          }
        case _ => None
      }.toVector
      case _ => Vector.empty
    }
    val fromKids = doc.dictGet(node, "Kids") match {
      case PArr(kids) => kids.flatMap { kid =>
        doc.resolve(kid) match {
          case kd: PDict => numberTreePairs(doc, kd, depth + 1)
          case _         => Vector.empty
        }
      }
      case _ => Vector.empty
    }
    own ++ fromKids
  }

  /** Lowercase roman numerals, standard subtractive form (Table 159
    * style r). */
  private[pdf] def roman(n: Int): String = {
    require(n >= 1, s"roman numerals start at 1, got $n")
    val steps = Seq(1000 -> "m", 900 -> "cm", 500 -> "d", 400 -> "cd",
      100 -> "c", 90 -> "xc", 50 -> "l", 40 -> "xl",
      10 -> "x", 9 -> "ix", 5 -> "v", 4 -> "iv", 1 -> "i")
    val sb = new StringBuilder
    var rest = n
    steps.foreach { case (v, s) =>
      while (rest >= v) { sb ++= s; rest -= v }
    }
    sb.result()
  }

  /** Table 159 style a: a..z for 1..26, then DOUBLED letters aa..zz
    * for 27..52, and so on — the letter repeats, it does not count in
    * base 26. */
  private[pdf] def letters(n: Int): String = {
    require(n >= 1, s"letter labels start at 1, got $n")
    val ch = ('a' + (n - 1) % 26).toChar
    ch.toString * ((n - 1) / 26 + 1)
  }

  private def uriOf(doc: PdfDocument, annot: PDict): Option[String] =
    doc.dictGet(annot, "A") match {
      case act: PDict if doc.dictGet(act, "S") == PName("URI") =>
        doc.dictGet(act, "URI") match {
          case PStr(bs) => Some(bs.map(b => (b & 0xff).toChar).mkString)
          case _        => None
        }
      case _ => None
    }

  private def rectOf(doc: PdfDocument, annot: PDict): (Double, Double, Double, Double) =
    doc.dictGet(annot, "Rect") match {
      case PArr(items) if items.length == 4 =>
        val n = items.map(o => doc.resolve(o).asNum.getOrElse(0.0))
        (math.min(n(0), n(2)), math.min(n(1), n(3)),
          math.max(n(0), n(2)), math.max(n(1), n(3)))
      case _ => (0.0, 0.0, 0.0, 0.0)
    }
}
