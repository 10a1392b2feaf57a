package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.core.model._
import graft.fixtures.InterleavedGen
import graft.pdf.PdfBuilder

/** Parity-pin tests for the per-doc extraction core (SURVEY.md §2.6 —
  * each fine-print item gets a named test so any future "fix" of a
  * reference quirk is a conscious, visible choice).
  */
class ExtractorSpec extends AnyFunSuite {

  private def pdfDoc(id: String, pages: Seq[String]): InterleavedDoc =
    InterleavedDoc(id, Seq(RawSpan("pdf_bytes",
      InterleavedGen.b64(PdfBuilder.simple(pages.map(PdfBuilder.tjLine(_)), flate = true)), "", 0)))

  test("pin 2.6.2: start_page off-by-one — startPage=3 begins at page 2") {
    val doc = pdfDoc("d1", (1 to 10).map(p => s"page $p"))
    val res = Extractor.extractDoc(doc, ExtractOptions(startPage = 3, pageCount = 4))
    // spans carry the ORIGINAL source page numbers (2..5), not ranks
    assert(res.doc.get.spans == Seq(
      Span("text", "page 2", "", 0, page = 2), Span("text", "page 3", "", 1, page = 3),
      Span("text", "page 4", "", 2, page = 4), Span("text", "page 5", "", 3, page = 5)))
  }

  test("pin 2.6.2 disabled: parityStartOffByOne=false starts at the requested page") {
    val doc = pdfDoc("d1", (1 to 10).map(p => s"page $p"))
    val res = Extractor.extractDoc(doc,
      ExtractOptions(startPage = 3, pageCount = 4, parityStartOffByOne = false))
    assert(res.doc.get.spans.map(_.text) == Seq("page 3", "page 4", "page 5", "page 6"))
  }

  test("pin 2.6.3: pageCount=0 means all pages; limit clamps to total") {
    val doc = pdfDoc("d2", (1 to 3).map(p => s"p$p"))
    assert(Extractor.extractDoc(doc, ExtractOptions()).doc.get.spans.map(_.text) ==
      Seq("p1", "p2", "p3"))
    assert(Extractor.extractDoc(doc, ExtractOptions(pageCount = 99)).doc.get.spans.length == 3)
    assert(Extractor.extractDoc(doc, ExtractOptions(pageCount = 2)).doc.get.spans.map(_.text) ==
      Seq("p1", "p2"))
  }

  test("pin 2.6.1: OCR text computed then dropped — stub engine, media spans keep no text") {
    val doc = InterleavedDoc("d3", Seq(RawSpan("media", "", "pic.png", 0)))
    val res = Extractor.extractDoc(doc, ExtractOptions(engine = "stub"))
    assert(res.doc.get.spans == Seq(Span("media", "", "pic.png", 0)))
    assert(res.ocrChars > 0) // the engine ran; its text is not in the spans
  }

  test("pdf with images: images never become spans (parity 2.6.1)") {
    val b = PdfBuilder.withImages("visible text")
    val doc = InterleavedDoc("d4", Seq(RawSpan("pdf_bytes", InterleavedGen.b64(b), "", 0)))
    val res = Extractor.extractDoc(doc, ExtractOptions(engine = "stub"))
    assert(res.doc.get.spans == Seq(Span("text", "visible text", "", 0, page = 1)))
    assert(res.ocrChars > 0) // 3 images OCR'd by the stub, then dropped
  }

  test("pin 2.6.6: unknown engine → failure record, not a crash") {
    val doc = InterleavedDoc("d5", Seq(RawSpan("text", "t", "", 0)))
    val res = Extractor.extractDoc(doc, ExtractOptions(engine = "nope"))
    assert(res.doc.isEmpty && res.error.exists(_.contains("unknown engine")))
  }

  test("ollama engine requires a model (server.ts:105-108 validation as row error)") {
    val doc = InterleavedDoc("d6", Seq(RawSpan("text", "t", "", 0)))
    val res = Extractor.extractDoc(doc, ExtractOptions(engine = "ollama"))
    assert(res.doc.isEmpty && res.error.exists(_.contains("requires a model")))
  }

  test("corrupt pdf → failed doc with error, no spans (fail-soft T9)") {
    val res = Extractor.extractDoc(InterleavedGen.corruptDoc(7), ExtractOptions())
    assert(res.doc.isEmpty && res.error.exists(_.startsWith("pdf:")))
  }

  test("mixed doc: contiguous order across kinds") {
    val (in, exp) = InterleavedGen.docWithGolden(3) // mixed text+media
    val res = Extractor.extractDoc(in, ExtractOptions())
    assert(res.doc.get == exp)
  }

  test("spans processed in offset order even if stored shuffled") {
    val in = InterleavedDoc("d7", Seq(
      RawSpan("text", "second", "", 1), RawSpan("text", "first", "", 0)))
    val res = Extractor.extractDoc(in, ExtractOptions())
    assert(res.doc.get.spans.map(_.text) == Seq("first", "second"))
  }

  test("golden corpus: extractor matches by-construction expectation for 200 docs") {
    (0L until 200L).foreach { i =>
      val (in, exp) = InterleavedGen.docWithGolden(i)
      val res = Extractor.extractDoc(in, ExtractOptions())
      assert(res.doc.contains(exp), s"doc $i mismatch: ${res.error}")
    }
  }

  test("determinism: extracting twice is byte-equal (retry idempotence)") {
    val (in, _) = InterleavedGen.docWithGolden(42)
    assert(Extractor.extractDoc(in, ExtractOptions()) == Extractor.extractDoc(in, ExtractOptions()))
  }
}
