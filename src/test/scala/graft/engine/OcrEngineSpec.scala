package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Offline tests for the real-engine shells: dispatch, argument /
  * request construction, and the fail-soft miss paths. No network and
  * no tesseract binary exist in CI — the exec/HTTP calls themselves
  * are covered by their Left-on-miss contracts.
  */
class OcrEngineSpec extends AnyFunSuite {

  test("dispatch: case-insensitive names, ollama requires model, unknown is an error") {
    assert(OcrEngine.forName("TESSERACT", None).map(_.name) == Right("tesseract"))
    assert(OcrEngine.forName("Ollama", Some("llava")).map(_.name) == Right("ollama"))
    assert(OcrEngine.forName("ollama", None).isLeft)
    assert(OcrEngine.forName("gpt", None).isLeft)
  }

  test("tesseract arg vector matches rusty_tesseract default Args (image → stdout)") {
    assert(TesseractEngine.args("/usr/bin/tesseract", "/tmp/page.png") ==
      Seq("/usr/bin/tesseract", "/tmp/page.png", "stdout"))
  }

  test("tesseract: missing binary or unreadable image → Left (fail-soft skip path)") {
    val res = new TesseractEngine().extractTextFromImage("/nonexistent/img.png")
    assert(res.isLeft)
    // whichever miss fires first (no binary on PATH here, or unreadable
    // image if one is installed), the error routes to skip-and-continue
    res.left.foreach(e => assert(e.contains("tesseract") || e.contains("not readable")))
  }

  test("ollama: unset env → Left naming the reference's env contract") {
    assume(!sys.env.contains("OLLAMA_BASE_HOST"))
    val res = new OllamaEngine("llava").extractTextFromImage("x.png")
    assert(res.left.exists(_.contains("OLLAMA_BASE_HOST")))
  }

  test("ollama request body: model + verbatim PROMPT + base64 image, stream:false") {
    val body = OllamaEngine.requestBody("llava:13b", "QUJD")
    assert(body.startsWith("""{"model":"llava:13b","prompt":"Please perform OCR"""))
    assert(body.contains(""""images":["QUJD"]"""))
    assert(body.endsWith(""""stream":false}"""))
    assert(body.contains("Do not include any explanations, commentary, or formatting modifications."))
  }

  test("ollama reply parsing: unescapes the response field, rejects malformed") {
    assert(OllamaEngine.parseResponse("""{"model":"m","response":"line1\nline\"2\"","done":true}""")
      == Right("line1\nline\"2\""))
    assert(OllamaEngine.parseResponse("""{"response":"ABC"}""") == Right("ABC"))
    assert(OllamaEngine.parseResponse("""{"done":true}""").isLeft)
    assert(OllamaEngine.parseResponse("""{"response":"trunca""").isLeft)
  }

  test("exec: nonexistent command → Left, true-like command round-trips stdout") {
    assert(TesseractEngine.exec(Seq("/nonexistent/bin")).isLeft)
    // /bin/echo stands in for the tesseract process contract: capture
    // stdout on exit 0
    assert(TesseractEngine.exec(Seq("/bin/echo", "ocr text")) == Right("ocr text\n"))
  }

  private def script(body: String): String = {
    val p = java.nio.file.Files.createTempFile("fake-tess", ".sh")
    java.nio.file.Files.write(p, s"#!/bin/sh\n$body\n".getBytes("UTF-8"))
    p.toFile.setExecutable(true)
    p.toString
  }

  test("exec: a child spamming >1MB of stderr cannot wedge the read (stderr-DISCARD pin)") {
    // without Redirect.DISCARD the child blocks once the ~64KB stderr
    // pipe fills and stdout never reaches EOF; with it this returns
    // immediately — a regression here shows up as a 60s watchdog Left
    val s = script(
      """i=0
        |while [ $i -lt 300 ]; do
        |  head -c 4096 /dev/zero | tr '\0' 'e' 1>&2
        |  i=$((i+1))
        |done
        |echo recognized""".stripMargin)
    assert(TesseractEngine.exec(Seq(s)) == Right("recognized\n"))
  }

  test("exec: nonzero exit reports the code; stdout before the failure is not mistaken for OCR text") {
    val s = script("echo partial\nexit 2")
    assert(TesseractEngine.exec(Seq(s)) == Left("tesseract exited 2"))
  }
}
