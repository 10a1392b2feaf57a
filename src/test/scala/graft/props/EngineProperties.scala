package graft.props

import java.util.zip.Deflater
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.core.model._
import graft.engine.Extractor
import graft.fixtures.InterleavedGen
import graft.html.Boilerplate
import graft.pdf.{ContentText, Filters, PdfBuilder, PdfDocument, PdfMeta, PdfParseException}

/** Property-based invariants (SURVEY.md §5.3): round-trip identities,
  * order/determinism laws, fail-soft totality. Pure JVM — no Spark
  * session — so these run in milliseconds and shrink well.
  */
object EngineProperties extends Properties("graft.engine") {

  // printable-ASCII words without PDF string delimiters (those are
  // covered by targeted escape tests in PdfSpec)
  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))
  private val line: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val pages: Gen[List[String]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, line))

  property("pdf round-trip: build(texts) |> extract == texts (plain)") =
    forAll(pages) { texts =>
      val pdf = PdfBuilder.simple(texts.map(t => PdfBuilder.tjLine(t)))
      val doc = PdfDocument.load(pdf)
      val got = doc.pages.map(p => ContentText.extractPageText(doc, p))
      got == texts.toVector
    }

  property("pdf round-trip with FlateDecode") =
    forAll(pages) { texts =>
      val pdf = PdfBuilder.simple(texts.map(t => PdfBuilder.tjLine(t)), flate = true)
      val doc = PdfDocument.load(pdf)
      doc.pages.map(p => ContentText.extractPageText(doc, p)) == texts.toVector
    }

  property("inflate is a left inverse of JDK deflate") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bytes =>
      val data = bytes.toArray
      val d = new Deflater()
      d.setInput(data); d.finish()
      val buf = new Array[Byte](data.length * 2 + 64)
      val n = d.deflate(buf)
      d.end()
      Filters.inflate(buf.take(n)).toSeq == data.toSeq
    }

  property("filters: asciiHex and ascii85 decode what the spec encodes") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bytes =>
      val data = bytes.toArray
      val hex = data.map(b => f"${b & 0xff}%02x").mkString + ">"
      Filters.asciiHexDecode(hex.getBytes) sameElements data
    }

  property("extractor: span order is always 0..n-1 contiguous") =
    forAll(Gen.chooseNum(0L, 5000L)) { i =>
      val (in, _) = InterleavedGen.docWithGolden(i)
      Extractor.extractDoc(in, ExtractOptions()).doc.forall { d =>
        d.spans.map(_.order) == d.spans.indices
      }
    }

  property("extractor: deterministic (task retry is idempotent)") =
    forAll(Gen.chooseNum(0L, 5000L)) { i =>
      val (in, _) = InterleavedGen.docWithGolden(i)
      Extractor.extractDoc(in, ExtractOptions()) ==
        Extractor.extractDoc(in, ExtractOptions())
    }

  property("extractor matches by-construction golden on any index") =
    forAll(Gen.chooseNum(0L, 20000L)) { i =>
      val (in, exp) = InterleavedGen.docWithGolden(i)
      Extractor.extractDoc(in, ExtractOptions()).doc.contains(exp)
    }

  property("page range/limit: kept pages = clamp(range ∩ [effStart, total])") =
    forAll(Gen.chooseNum(1, 10), Gen.chooseNum(0, 12), Gen.chooseNum(1, 8)) {
      (startPage, pageCount, total) =>
        val texts = (1 to total).map(p => s"page $p")
        val pdf = PdfBuilder.simple(texts.map(t => PdfBuilder.tjLine(t)))
        val in = InterleavedDoc("d", Seq(RawSpan("pdf_bytes", InterleavedGen.b64(pdf), "", 0)))
        val got = Extractor.extractDoc(in,
          ExtractOptions(startPage = startPage, pageCount = pageCount)).doc.get.spans
        val effStart = math.max(0, startPage - 1) // parity pin §2.6.2
        val limit = if (pageCount == 0 || pageCount > total) total else pageCount
        val expected = (1 to total).filter(_ >= effStart).take(limit).map(p => s"page $p")
        got.map(_.text) == expected
    }

  property("boilerplate: kept paragraph text survives in order") =
    forAll(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, line))) { paras =>
      val html = "<html><body><nav>chrome</nav>" +
        paras.map(p => s"<p>$p</p>").mkString + "<footer>c</footer></body></html>"
      val got = Boilerplate.extract(html).collect { case Boilerplate.TextPiece(t) => t }
      got == paras
    }

  property("extractor is total on arbitrary junk pdf bytes (fail-soft, never throws)") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { junk =>
      val in = InterleavedDoc("j",
        Seq(RawSpan("pdf_bytes", InterleavedGen.b64(junk.toArray), "", 0)))
      val r = Extractor.extractDoc(in, ExtractOptions())
      // either parses (unlikely) or reports a failure record — no throw
      r.doc.isDefined || r.error.isDefined
    }

  property("extractor is total under random byte mutations of VALID PDFs (deep fail-soft)") = {
    // junk bytes die at the header; mutations of a real document reach
    // the xref walker, ObjStm/xref-stream decode, filters, page tree,
    // and the content interpreter — every layer must fail soft
    val mutations = Gen.listOf(Gen.zip(Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(-128, 127)))
    forAll(pages, mutations, Gen.chooseNum(0, 2)) { (texts, muts, style) =>
      val pdf = style match {
        case 0 => PdfBuilder.simple(texts.map(t => PdfBuilder.tjLine(t)), flate = true)
        case 1 => PdfBuilder.objStm(PdfBuilder.tjLine(texts.head))
        case _ => PdfBuilder.withImages(texts.head)
      }
      muts.foreach { case (pos, b) => pdf(pos % pdf.length) = b.toByte }
      val in = InterleavedDoc("m",
        Seq(RawSpan("pdf_bytes", InterleavedGen.b64(pdf), "", 0)))
      val r = Extractor.extractDoc(in, ExtractOptions())
      r.doc.isDefined || r.error.isDefined
    }
  }

  property("PdfMeta is total under random mutations of metadata fixtures (declared errors only)") = {
    // the round-8 parse surface — /Info strings, link annotations,
    // outline + name trees, AcroForm trees, PageLabels number trees,
    // string decryption — must fail with the DECLARED PdfParseException
    // class (or succeed) on any byte corruption: no NPE, no match
    // error, no unbounded walk, no JDK crypto crash class
    val mutations = Gen.listOf(Gen.zip(Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(-128, 127)))
    forAll(mutations, Gen.chooseNum(0, 4)) { (muts, style) =>
      val pdf = style match {
        case 0 => PdfBuilder.withInfoAndLinks(Seq("m"),
          Seq("Title" -> PdfBuilder.utf16Bytes("Té"),
            "Author" -> PdfBuilder.latin1Bytes("J A")),
          Seq(Seq(("https://x.example/a", (1, 2, 3, 4)))))
        case 1 => PdfBuilder.withOutline(Seq("a", "b"),
          Seq((0, "s(é)", 0), (1, "k", 1), (0, "n", -1)), namedDests = true)
        case 2 => PdfBuilder.withPageLabels(Seq("p", "q", "r"),
          Seq((0, Some("r"), None, None), (2, Some("D"), Some("x-"), Some(3))),
          kidsTree = true)
        case 3 => PdfBuilder.withAcroForm(Seq("p"),
          Seq((0, "grp", Some("Tx"), Some("v")), (1, "kid", None, None)))
        case _ => PdfBuilder.withInfoAndLinks(Seq("m"),
          Seq("Author" -> PdfBuilder.latin1Bytes("J")),
          Seq(Seq(("https://e/x", (0, 0, 9, 9)))),
          enc = Some(PdfBuilder.EncAes))
      }
      muts.foreach { case (pos, b) => pdf(pos % pdf.length) = b.toByte }
      def total(f: PdfDocument => Any): Boolean =
        try { f(PdfDocument.load(pdf)); true }
        catch {
          case _: PdfParseException => true // the declared fail-soft class
          case _: Throwable         => false
        }
      total(PdfMeta.info) && total(PdfMeta.links) && total(PdfMeta.outline) &&
        total(PdfMeta.formFields) && total(PdfMeta.pageLabels)
    }
  }
}
