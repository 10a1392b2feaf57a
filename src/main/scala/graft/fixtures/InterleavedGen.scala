package graft.fixtures

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.Base64
import graft.core.model._
import graft.pdf.PdfBuilder

/** Deterministic interleaved-corpus generator (FIXTURES.md §1, §8).
  *
  * Every doc — and its EXPECTED extraction output — is a pure function
  * of the doc index: the golden is derived from the construction
  * rules, never by running the extractor, so it is a true oracle
  * (SURVEY.md §5.2). Seeded arithmetic only; no wall-clock, no
  * `Random`. Safe to evaluate on executors in parallel.
  *
  * Mix per index i (mod 10):
  *   0    → HTML doc (nav/footer boilerplate + article + img)
  *   1    → text-only doc (3 spans)
  *   2    → media-only doc (2 spans)
  *   3    → mixed text+media
  *   9    → multi-page "heavy" PDF (skew tail; page count grows with i)
  *   else → PDF doc; style = i mod 4: 0 = single-page object-stream,
  *          1 = single-page with embedded image XObjects
  *          (real JPEG-DCT + Flate-PNG + Flate-raw + raw — the image
  *          sink path),
  *          2/3 = 3-4 pages plain/flate
  */
object InterleavedGen {

  private val words = Vector(
    "data", "spark", "span", "page", "engine", "stream", "shuffle", "filter",
    "corpus", "token", "lineage", "bucket", "commit", "extract", "text",
    "media", "image", "query", "plan", "scan", "join", "agg", "window",
    "salt", "skew", "batch", "graph", "vector", "hash", "byte", "quick",
    "brown", "fox", "jumps", "lazy", "dog", "alpha", "beta", "gamma", "delta")

  /** Deterministic sentence for (docIdx, k). */
  def sent(i: Long, k: Int): String = {
    var x = i * 6364136223846793005L + k * 1442695040888963407L + 42L
    def next(): Int = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; ((x >>> 33) % words.length).toInt }
    val n = 6 + math.floorMod(next(), 7)
    (0 until n).map(_ => words(math.floorMod(next(), words.length))).mkString(" ")
  }

  def docId(i: Long): String = f"doc$i%08d"

  /** Heavy-doc page count: 32..95 pages, varying with i. */
  private def heavyPages(i: Long): Int = 32 + ((i / 10) % 64).toInt

  /** Build input doc + by-construction expected output for index i. */
  def docWithGolden(i: Long): (InterleavedDoc, ExtractedDoc) = {
    val id = docId(i)
    (i % 10) match {
      case 0 =>
        val a = sent(i, 0); val b = sent(i, 1)
        val img = s"img_${i}_0.png"
        val html =
          s"""<html><head><title>t$i</title><style>p{color:red}</style></head><body>
             |<nav><a href="/">home</a> <a href="/x">about</a></nav>
             |<article><p>$a.</p><img src="$img"><p>$b.</p></article>
             |<footer>copyright $i</footer></body></html>""".stripMargin
        val in = InterleavedDoc(id, Seq(RawSpan("html", html, "", 0)))
        val exp = ExtractedDoc(id, Seq(
          Span("text", s"$a.", "", 0),
          Span("media", "", img, 1),
          Span("text", s"$b.", "", 2)))
        (in, exp)
      case 1 =>
        val ts = (0 until 3).map(k => sent(i, k))
        val in = InterleavedDoc(id, ts.zipWithIndex.map { case (t, k) => RawSpan("text", t, "", k) })
        val exp = ExtractedDoc(id, ts.zipWithIndex.map { case (t, k) => Span("text", t, "", k) })
        (in, exp)
      case 2 =>
        val refs = (0 until 2).map(k => s"m_${i}_$k.png")
        val in = InterleavedDoc(id, refs.zipWithIndex.map { case (r, k) => RawSpan("media", "", r, k) })
        val exp = ExtractedDoc(id, refs.zipWithIndex.map { case (r, k) => Span("media", "", r, k) })
        (in, exp)
      case 3 =>
        val t0 = sent(i, 0); val r = s"m_${i}_0.png"; val t1 = sent(i, 1)
        val in = InterleavedDoc(id, Seq(
          RawSpan("text", t0, "", 0), RawSpan("media", "", r, 1), RawSpan("text", t1, "", 2)))
        val exp = ExtractedDoc(id, Seq(
          Span("text", t0, "", 0), Span("media", "", r, 1), Span("text", t1, "", 2)))
        (in, exp)
      case 9 =>
        val n = heavyPages(i)
        val texts = (1 to n).map(p => s"heavy $i page $p ${sent(i, p)}")
        val pdf = PdfBuilder.simple(texts.map(t => PdfBuilder.tjLine(t)), flate = true)
        val in = InterleavedDoc(id, Seq(RawSpan("pdf_bytes", b64(pdf), "", 0)))
        val exp = ExtractedDoc(id,
          texts.zipWithIndex.map { case (t, k) => Span("text", t, "", k, page = k + 1) })
        (in, exp)
      case _ =>
        val style = i % 4
        // style 0: single-page object-stream PDF; style 1: single-page
        // with embedded image XObjects (JPEG-DCT + Flate-PNG + Flate +
        // raw — exercises
        // the reference's image sink path, SURVEY §2 S6/T4-T6);
        // styles 2/3: multi-page plain/flate
        val pages = if (style <= 1) 1 else 1 + (i % 4).toInt
        val texts = (1 to pages).map(p => s"doc $i page $p ${sent(i, p)}")
        val pdf =
          if (style == 0) PdfBuilder.objStm(PdfBuilder.tjLine(texts.head))
          else if (style == 1) PdfBuilder.withImages(texts.head)
          else if (style == 2) PdfBuilder.simple(texts.map(PdfBuilder.tjLine(_)))
          else PdfBuilder.simple(texts.map(PdfBuilder.tjLine(_)), flate = true)
        val in = InterleavedDoc(id, Seq(RawSpan("pdf_bytes", b64(pdf), "", 0)))
        val exp = ExtractedDoc(id,
          texts.zipWithIndex.map { case (t, k) => Span("text", t, "", k, page = k + 1) })
        (in, exp)
    }
  }

  def b64(bytes: Array[Byte]): String = Base64.getEncoder.encodeToString(bytes)

  /** A corrupt-PDF doc (fail-soft path; FIXTURES.md `pdf_corrupt`). */
  def corruptDoc(i: Long): InterleavedDoc =
    InterleavedDoc(docId(i), Seq(RawSpan("pdf_bytes", b64(PdfBuilder.corrupt()), "", 0)))
}
