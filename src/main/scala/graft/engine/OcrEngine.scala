package graft.engine

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

/** Tesseract shell, mirroring the reference engine's contract
  * (/root/reference/extractor/src/engine/tesseract.rs:15-37). The
  * sandbox has no tesseract binary/JNI — the call path is STUBBED
  * (`???`-equivalent): it returns Left so failures route through the
  * same skip-and-log branch the reference uses
  * (/root/reference/extractor/src/engine/mod.rs:118-127). A real
  * deployment would exec `tesseract` here. */
final class TesseractEngine extends OcrEngine {
  def name = "tesseract"
  def extractTextFromImage(mediaRef: String): Either[String, String] =
    Left("tesseract binary not available in this environment") // STUB: real impl shells out to tesseract
}

/** Ollama vision-LLM shell, mirroring
  * /root/reference/extractor/src/engine/ollama.rs:10,24-50. PROMPT is
  * preserved verbatim for behavioral fidelity. The HTTP call is
  * STUBBED (zero-egress sandbox); a real deployment posts
  * base64(image)+PROMPT to the Ollama generate endpoint. */
final class OllamaEngine(val model: String) extends OcrEngine {
  def name = "ollama"
  def extractTextFromImage(mediaRef: String): Either[String, String] =
    Left(s"ollama host not available in this environment (model=$model)") // STUB: real impl calls /api/generate
}

object OllamaEngine {
  /** Verbatim from /root/reference/extractor/src/engine/ollama.rs:10. */
  val Prompt: String =
    "Please perform OCR on the supplied image and output the extracted text exactly as it appears. " +
    "If the image contains multiple columns or sections, preserve the structural layout as much as possible. " +
    "Do not include any explanations, commentary, or formatting modifications."
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
