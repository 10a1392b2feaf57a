package graft.core

/** Core data model of the graft engine.
  *
  * Input/output shapes follow BASELINE.json `input_hint` and the
  * reference's record types (see SURVEY.md §1.2):
  *   - reference job record `NewFileProcessQueue`
  *     (/root/reference/extractor/src/worker.rs:4-11) → [[ExtractOptions]]
  *   - reference output `PageExtractInfo`
  *     (/root/reference/extractor/src/types/engine_handler.rs:14-17)
  *     generalizes to [[Span]] with kind/media_ref/order.
  */
object model {

  /** One span of the *input* interleaved document.
    *
    * kind ∈ {"pdf_bytes", "html", "text", "media"};
    * `text` carries base64 PDF bytes for kind=pdf_bytes, raw HTML for
    * kind=html, plain text for kind=text, "" for kind=media;
    * `offset` is the 0-based position of the span within the doc.
    */
  final case class RawSpan(kind: String, text: String, media_ref: String, offset: Int)

  /** A row of the input table (doc_id, spans). */
  final case class InterleavedDoc(doc_id: String, spans: Seq[RawSpan])

  /** One span of the *output* extracted document.
    *
    * Parity contract (SURVEY.md §2.6.1): PDF pages emit exactly one
    * text span per kept page in ascending page order; OCR text is
    * computed-then-dropped like the reference
    * (/root/reference/extractor/src/engine/mod.rs:132-135).
    * `order` is the 0-based rank of the span within the doc.
    *
    * `page` is the ORIGINAL 1-based source page number for PDF-derived
    * text spans (0 for non-PDF spans) — the reference emits the real
    * page number in its output (`PageExtractInfo.page_num`,
    * /root/reference/extractor/src/engine/mod.rs:90), which differs
    * from the span rank whenever `start_page > 1`; carrying it keeps
    * [[graft.job.ExtractJob.readDocJson]] byte-equal to the reference
    * under non-default options (SURVEY.md §2.6.2 + §2.6.3 composed).
    */
  final case class Span(kind: String, text: String, media_ref: String, order: Int,
      page: Int = 0)

  final case class ExtractedDoc(doc_id: String, spans: Seq[Span])

  /** Job options — mirrors the reference's `NewFileProcessQueue`
    * (/root/reference/extractor/src/worker.rs:4-11; defaults
    * /root/reference/api/src/server.ts:83). `pageCount == 0` means all
    * pages. `parityStartOffByOne` reproduces the reference's
    * `start_page.saturating_sub(1)` off-by-one
    * (/root/reference/extractor/src/engine/mod.rs:70,74 — SURVEY.md
    * §2.6.2): requested start page s effectively starts at max(1, s-1).
    */
  final case class ExtractOptions(
      startPage: Int = 1,
      pageCount: Int = 0,
      engine: String = "tesseract",
      ocrModel: Option[String] = None,
      parityStartOffByOne: Boolean = true,
      /** User-or-owner password for encrypted PDFs (UTF-8 bytes are
        * passed to the handler; tried as user, then owner — see
        * [[graft.pdf.PdfCrypt.forDocument]]). None/empty = the
        * no-password-openable class. */
      password: Option[String] = None)

  /** One lineage/metrics row, appended when a bucket of documents has
    * been fully extracted and its output committed. Replaces the
    * reference's Redis progress/status keys
    * (/root/reference/extractor/src/libs/redis.rs:132-183) with an
    * idempotent, queryable commit log (SURVEY.md §4.3).
    */
  final case class LineageRow(
      job_id: String,
      bucket: Int,
      doc_count: Long,
      span_count: Long,
      bytes_in: Long,
      failed_docs: Long,
      status: String, // "committed" | "failed"
      attempt: Int,
      committed_at: Long, // epoch millis of the commit (driver clock)
      unmapped_codes: Long = 0L) // encoding-undefined font codes (U+FFFD'd, counted)

  /** Per-bucket metrics accumulated inside the extraction tasks. */
  final case class BucketStats(
      docCount: Long = 0L,
      spanCount: Long = 0L,
      bytesIn: Long = 0L,
      failedDocs: Long = 0L,
      unmappedCodes: Long = 0L) {
    def +(o: BucketStats): BucketStats =
      BucketStats(docCount + o.docCount, spanCount + o.spanCount,
        bytesIn + o.bytesIn, failedDocs + o.failedDocs,
        unmappedCodes + o.unmappedCodes)
  }
}
