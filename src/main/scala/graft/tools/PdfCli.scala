package graft.tools

import java.nio.file.{Files, Paths}
import graft.pdf.{ContentText, PdfBuilder, PdfDocument, PdfParseException}

/** Tiny CLI surface over the PDF reader — the library's runtime
  * surface for manual driving and verification.
  *
  * Usage:
  *   run gen <out.pdf> [simple|flate|objstm|images|multiline|corrupt]
  *   run text <in.pdf>          — print per-page extracted text
  */
object PdfCli {
  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: out :: rest =>
      val kind = rest.headOption.getOrElse("simple")
      val bytes = kind match {
        case "simple"    => PdfBuilder.simple(Seq(PdfBuilder.tjLine("Hello pdfz")))
        case "flate"     => PdfBuilder.simple(Seq(
          PdfBuilder.tjLine("page one text"), PdfBuilder.tjLine("page two text")), flate = true)
        case "objstm"    => PdfBuilder.objStm(PdfBuilder.tjLine("Hello pdfz"))
        case "images"    => PdfBuilder.withImages("text beside images")
        case "multiline" => PdfBuilder.simple(Seq(PdfBuilder.multiLine(Seq("First line", "Second line"))))
        case "corrupt"   => PdfBuilder.corrupt()
        case other       => System.err.println(s"unknown fixture kind '$other'"); sys.exit(2)
      }
      Files.write(Paths.get(out), bytes)
      println(s"wrote ${bytes.length} bytes to $out ($kind)")
    case "text" :: in :: Nil =>
      try {
        val doc = PdfDocument.load(Files.readAllBytes(Paths.get(in)))
        doc.pages.zipWithIndex.foreach { case (p, i) =>
          println(s"--- page ${i + 1} ---")
          println(ContentText.extractPageText(doc, p))
        }
        println(s"(${doc.pageCount} pages)")
      } catch {
        case e: PdfParseException =>
          System.err.println(s"parse error: ${e.getMessage}"); sys.exit(1)
        case e: java.nio.file.NoSuchFileException =>
          System.err.println(s"no such file: ${e.getFile}"); sys.exit(1)
      }
    case _ =>
      System.err.println("usage: PdfCli gen <out.pdf> [kind] | PdfCli text <in.pdf>")
      sys.exit(2)
  }
}
