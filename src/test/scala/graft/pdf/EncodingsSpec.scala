package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Table-level invariants of the Annex-D encodings — the structural
  * properties a mistyped or dropped row breaks, pinned independently
  * of the fixture-PDF tests in PdfSpec. */
class EncodingsSpec extends AnyFunSuite {

  private def defined(t: Array[String]): Int = t.count(_.nonEmpty)

  test("defined-code counts match Annex D row counts") {
    // ASCII 95 + the high-range rows each table claims
    assert(defined(Encodings.standard) == 149, s"std ${defined(Encodings.standard)}")
    // 95 ASCII + (128 high slots − the 15 non-Latin Mac symbol slots
    // Annex D leaves undefined: notequal..apple) = 208
    assert(defined(Encodings.macRoman) == 208, s"mac ${defined(Encodings.macRoman)}")
    // WinAnsi: every code above 0x20 is defined (bullet-fill footnote)
    assert((0x21 until 256).forall(Encodings.winAnsi(_).nonEmpty))
    assert((0 until 0x20).forall(Encodings.winAnsi(_).isEmpty))
  }

  test("structural spot pins: deviations, duplicates, block boundaries") {
    // StandardEncoding's famous ASCII deviations
    assert(Encodings.standard(0x27) == "’" && Encodings.standard(0x60) == "‘")
    assert(Encodings.standard(0xA9) == "'" && Encodings.standard(0xC1) == "`")
    // footnote duplicates
    assert(Encodings.macRoman(0xCA) == " ")
    assert(Encodings.winAnsi(0xA0) == " " && Encodings.winAnsi(0xAD) == "-")
    // WinAnsi unused slots became bullets, real slots did not
    assert(Encodings.winAnsi(0x81) == "•" && Encodings.winAnsi(0x8A) == "Š")
    // PDFDocEncoding's packed blocks
    assert(Encodings.pdfDoc(0x18) == "˘" && Encodings.pdfDoc(0x1F) == "˜")
    assert(Encodings.pdfDoc(0x80) == "•" && Encodings.pdfDoc(0x9E) == "ž")
    assert(Encodings.pdfDoc(0xA0) == "€")
    assert(Encodings.pdfDoc(0xAD).isEmpty) // undefined, unlike WinAnsi
    // every mapped entry is a single char from the shared glyph map
    Seq(Encodings.standard, Encodings.macRoman, Encodings.winAnsi, Encodings.pdfDoc)
      .foreach(t => t.filter(_.nonEmpty).foreach(s => assert(s.length == 1)))
  }
}
