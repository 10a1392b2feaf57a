package graft.engine

import java.nio.file.{Files, Paths}

/** OCR engine abstraction ≡ the reference's `EngineHandler` trait
  * (/root/reference/extractor/src/types/engine_handler.rs:52-57).
  *
  * Parity pin (SURVEY.md §2.6.1): the reference computes OCR text per
  * page image and then DROPS it from the observable output
  * (/root/reference/extractor/src/engine/mod.rs:121-122 vs 132-135).
  * The pipeline therefore invokes the engine for metrics fidelity but
  * never emits its text into spans in parity mode.
  */
trait OcrEngine extends Serializable {
  /** media ref (image name/path) → OCR'd text, or an error message.
    * Deterministic implementations keep Spark task retries idempotent. */
  def extractTextFromImage(mediaRef: String): Either[String, String]
  def name: String
}

/** Deterministic, hermetic stub: a pure function of the media ref so
  * tests and retries are stable (no external process, no wall-clock). */
final class StubEngine extends OcrEngine {
  def name = "stub"
  def extractTextFromImage(mediaRef: String): Either[String, String] =
    Right(s"[ocr:${Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(mediaRef))}]")
}

/** Tesseract engine, mirroring the reference's contract
  * (/root/reference/extractor/src/engine/tesseract.rs:15-37: open image
  * → grayscale → `rusty_tesseract::image_to_string` with default Args).
  * Re-expressed as a process exec — rusty_tesseract itself shells out to
  * the `tesseract` CLI; default Args ≡ `tesseract <image> stdout` (the
  * grayscale step is left to tesseract's own Leptonica preprocessing —
  * pre-graying via [[graft.pdf.ImageCodec]] would be redundant work on
  * an input tesseract grayscales anyway, and OCR text is dropped from
  * parity output either way, mod.rs:132-135). Fail-soft contract: any
  * miss (no binary on PATH, unreadable image, nonzero exit) returns
  * Left, routing through the same skip-and-log branch the reference
  * uses (engine/mod.rs:118-127). */
final class TesseractEngine extends OcrEngine {
  def name = "tesseract"

  def extractTextFromImage(mediaRef: String): Either[String, String] =
    TesseractEngine.binary match {
      case None => Left("tesseract binary not available on PATH")
      case Some(bin) =>
        if (!Files.isReadable(Paths.get(mediaRef)))
          Left(s"image not readable: $mediaRef")
        else TesseractEngine.exec(TesseractEngine.args(bin, mediaRef))
    }
}

object TesseractEngine {
  /** Arg vector ≡ rusty_tesseract's default Args invocation:
    * `tesseract <image> stdout` (output to stdout, default language/
    * psm/oem — tesseract.rs:31 `Args::default()`). */
  def args(binary: String, imagePath: String): Seq[String] =
    Seq(binary, imagePath, "stdout")

  /** PATH probe, cached per JVM (executor-side static). */
  lazy val binary: Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .map(d => Paths.get(d, "tesseract"))
      .find(p => Files.isRegularFile(p) && Files.isExecutable(p))
      .map(_.toString)

  /** Hard deadline on the child process — keeps the fail-soft (Left)
    * contract even when tesseract wedges. */
  private[engine] val TimeoutSec = 60L

  /** Daemon timer shared by all execs on this executor (one thread). */
  private val watchdog = new java.util.Timer("tesseract-watchdog", true)

  private[engine] def exec(cmd: Seq[String]): Either[String, String] =
    try {
      val pb = new ProcessBuilder(cmd: _*)
      // stderr is DISCARDED, not left on a pipe: tesseract writes
      // warnings there, and an undrained ~64KB pipe fills, blocks the
      // child, and stdout never reaches EOF — a hung executor thread
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      // the deadline must cover the stdout READ too (a child that hangs
      // with its pipe open blocks readAllBytes before any waitFor runs):
      // a watchdog kills the child at the deadline, which EOFs the pipe
      // and unblocks the read
      val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
      val kill = new java.util.TimerTask {
        def run(): Unit = { timedOut.set(true); proc.destroyForcibly() }
      }
      watchdog.schedule(kill, TimeoutSec * 1000)
      var settled = false // child known-exited (or deliberately abandoned)
      try {
        val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
        // BOUNDED wait even after a kill: SIGKILL cannot reach a
        // D-state child, so an unbounded waitFor could still hang
        val done = proc.waitFor(TimeoutSec, java.util.concurrent.TimeUnit.SECONDS)
        settled = done
        // a clean exit wins any watchdog race: the timer can fire (and
        // "kill" an already-exited child) between a successful read and
        // this check — exit 0 with full output is valid OCR regardless
        // of the timedOut flag (a child the watchdog actually killed
        // mid-run cannot report exit 0)
        if (done && proc.exitValue() == 0) Right(out)
        else if (timedOut.get()) Left(s"tesseract timed out after ${TimeoutSec}s")
        else if (!done) { proc.destroyForcibly(); Left("tesseract did not exit") }
        else Left(s"tesseract exited ${proc.exitValue()}")
      } finally {
        // a throw mid-read (OOM on unbounded stdout, IO error) must not
        // leak a live child whose only deadline we are about to cancel
        if (!settled && proc.isAlive) proc.destroyForcibly()
        kill.cancel()
      }
    } catch { case scala.util.control.NonFatal(e) => Left(s"tesseract exec: ${e.getMessage}") }
}

/** Ollama vision-LLM engine, mirroring
  * /root/reference/extractor/src/engine/ollama.rs:24-50: read image
  * bytes → base64 → POST a GenerationRequest(model, PROMPT, [image])
  * to the Ollama `/api/generate` endpoint at OLLAMA_BASE_HOST:
  * OLLAMA_BASE_PORT (the reference's env contract, ollama.rs:38-42 —
  * a missing env var is an error result, not a crash). PROMPT is
  * preserved verbatim. Fail-soft: unreachable host / non-200 / bad
  * body → Left. */
final class OllamaEngine(val model: String) extends OcrEngine {
  def name = "ollama"

  def extractTextFromImage(mediaRef: String): Either[String, String] =
    (sys.env.get("OLLAMA_BASE_HOST"), sys.env.get("OLLAMA_BASE_PORT")) match {
      case (Some(host), Some(port)) =>
        if (!Files.isReadable(Paths.get(mediaRef))) Left(s"image not readable: $mediaRef")
        else {
          val b64 = java.util.Base64.getEncoder.encodeToString(
            Files.readAllBytes(Paths.get(mediaRef)))
          OllamaEngine.post(s"http://$host:$port/api/generate",
            OllamaEngine.requestBody(model, b64))
        }
      case _ =>
        Left(s"ollama host not configured (OLLAMA_BASE_HOST/OLLAMA_BASE_PORT unset; model=$model)")
    }
}

object OllamaEngine {
  /** Verbatim from /root/reference/extractor/src/engine/ollama.rs:10. */
  val Prompt: String =
    "Please perform OCR on the supplied image and output the extracted text exactly as it appears. " +
    "If the image contains multiple columns or sections, preserve the structural layout as much as possible. " +
    "Do not include any explanations, commentary, or formatting modifications."

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** The Ollama generate request body (public API shape; ollama-rs
    * GenerationRequest(model, PROMPT).add_image(b64) serializes to
    * exactly these fields). `stream:false` ≡ ollama-rs's non-streaming
    * `generate`. Pure function — unit-testable offline. */
  def requestBody(model: String, imageB64: String): String =
    s"""{"model":"${jsonEsc(model)}","prompt":"${jsonEsc(Prompt)}",""" +
      s""""images":["$imageB64"],"stream":false}"""

  /** Minimal extraction of the `response` string field from the Ollama
    * reply (the only field the reference reads — ollama.rs:49). */
  private[engine] def parseResponse(body: String): Either[String, String] = {
    val key = "\"response\":\""
    val start = body.indexOf(key)
    if (start < 0) return Left("ollama reply has no response field")
    val sb = new StringBuilder
    var i = start + key.length
    var done = false
    while (!done && i < body.length) {
      body.charAt(i) match {
        case '"' => done = true
        case '\\' if i + 1 < body.length =>
          body.charAt(i + 1) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' if i + 5 < body.length =>
              sb += Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar
              i += 4
            case c => sb += c
          }
          i += 1
        case c => sb += c
      }
      i += 1
    }
    if (done) Right(sb.toString) else Left("ollama reply truncated")
  }

  private[engine] def post(url: String, body: String): Either[String, String] =
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (res.statusCode() == 200) parseResponse(res.body())
      else Left(s"ollama http ${res.statusCode()}")
    } catch { case scala.util.control.NonFatal(e) => Left(s"ollama http: ${e.getMessage}") }
}

object OcrEngine {
  /** Engine dispatch ≡ `Engines::from`
    * (/root/reference/extractor/src/types/engine_handler.rs:24-30):
    * case-insensitive name match. Unknown engines become a per-row
    * error (deliberate improvement over the reference's worker panic,
    * SURVEY.md §2.6.6). */
  def forName(engine: String, model: Option[String]): Either[String, OcrEngine] =
    engine.toLowerCase match {
      case "tesseract" => Right(new TesseractEngine)
      case "ollama" =>
        model match {
          case Some(m) => Right(new OllamaEngine(m))
          case None    => Left("ollama engine requires a model")
        }
      case "stub" => Right(new StubEngine)
      case other  => Left(s"unknown engine '$other'")
    }
}
