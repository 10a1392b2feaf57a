package graft.job

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2
import graft.core.model._
import graft.engine.Extractor
import graft.io.TableIO

/** The flagship extraction pipeline — the reference's whole dataflow
  * (queue → worker pool → engines → JSON sink → Redis tracker,
  * SURVEY.md §3.1) as ONE Spark query per chunk:
  *
  *   read input → resume anti-join(lineage) → [salted repartition]
  *     → mapPartitions(extract) → append output parquet
  *     → commit lineage manifest
  *
  * Two physical modes (Config.mode): the default "scan" plan is
  * map-only — extraction is embarrassingly parallel, so shuffling the
  * corpus is pure cost; resumability does NOT require it because the
  * commit unit (bucket = hash(doc_id)) is row-wise. "bucketed" pays
  * one salted shuffle for bucket-aligned output layout.
  *
  * Scale design (SURVEY.md §4.3):
  *  - bucket = pmod(xxhash64(doc_id), numBuckets): deterministic across
  *    runs (resume correctness) and across cluster sizes;
  *  - salt = pmod(xxhash64(doc_id, 7), saltsPerBucket) spreads a hot
  *    bucket over `saltsPerBucket` tasks, so one giant multi-page PDF
  *    row cannot serialize a whole bucket behind one core — the skew
  *    answer the reference lacks (one 10k-page doc stalls one of its 5
  *    semaphore permits, queue_handler.rs:43);
  *  - per-bucket metrics ride a map accumulator inside the SAME action
  *    as the write — no second pass, no cache, no driver-side data;
  *  - chunked commits (`chunkBuckets`) bound the blast radius of a
  *    kill: each chunk is one Spark action followed by one atomic
  *    lineage append, so resume loses at most one chunk of work.
  */
object ExtractJob {

  final case class Config(
      jobId: String = "extract",
      numBuckets: Int = 64,
      saltsPerBucket: Int = 8,
      chunkBuckets: Int = 0, // 0 = all pending buckets in one action
      maxChunks: Int = Int.MaxValue, // stop after N chunks (incremental / kill simulation)
      attempt: Int = 1,
      /** "scan" (default): map-only — extraction runs inside the scan
        * partitions, NO shuffle of corpus bytes, output files carry
        * `bucket` as a plain column. The lineage/commit protocol is
        * unchanged (buckets are row-wise hashes, so a successful chunk
        * action fully covers its buckets regardless of physical
        * layout). At 10^12 docs this saves shuffling the entire corpus.
        *
        * "bucketed": salted repartition on (bucket, salt) before
        * extraction + partitionBy(bucket) output — pays one full
        * shuffle to get bucket-aligned output files (downstream
        * bucket-join locality, per-bucket point-read pruning) and
        * salt-spread skew. Use when the output table's layout matters
        * more than extraction throughput. */
      mode: String = "scan",
      opts: ExtractOptions = ExtractOptions())

  final case class JobStats(
      committedBucketsBefore: Int,
      bucketsProcessed: Int,
      docs: Long,
      spans: Long,
      bytesIn: Long,
      failedDocs: Long)

  /** Map accumulator: bucket → stats, merged across tasks. */
  final class BucketStatsAcc extends AccumulatorV2[(Int, BucketStats), Map[Int, BucketStats]] {
    private val m = scala.collection.mutable.HashMap.empty[Int, BucketStats]
    def isZero: Boolean = m.isEmpty
    def copy(): BucketStatsAcc = { val c = new BucketStatsAcc; m.foreach(kv => c.m += kv); c }
    def reset(): Unit = m.clear()
    def add(v: (Int, BucketStats)): Unit =
      m.update(v._1, m.getOrElse(v._1, BucketStats()) + v._2)
    def merge(o: AccumulatorV2[(Int, BucketStats), Map[Int, BucketStats]]): Unit =
      o.value.foreach { case (k, v) => m.update(k, m.getOrElse(k, BucketStats()) + v) }
    def value: Map[Int, BucketStats] = m.toMap
  }

  /** Extracted row carrying its bucket for partitioned append. */
  final case class OutRow(doc_id: String, spans: Seq[Span], bucket: Int)
  final case class InRow(doc_id: String, spans: Seq[RawSpan], bucket: Int, salt: Int)

  /** Input must have columns (doc_id string, spans array<struct<kind,
    * text, media_ref, offset>>). Returns run statistics. */
  def run(spark: SparkSession, input: DataFrame, tableDir: String, cfg: Config): JobStats = {
    import spark.implicits._

    val committed = TableIO.committedBuckets(tableDir, cfg.jobId)
    val pendingBuckets = (0 until cfg.numBuckets).filterNot(committed)
    if (pendingBuckets.isEmpty)
      return JobStats(committed.size, 0, 0, 0, 0, 0)

    // deterministic bucket/salt assignment (SURVEY.md §7.4.3: derived
    // purely from doc_id, never from partition index)
    val withKeys = input
      .select($"doc_id", $"spans")
      .withColumn("bucket", pmod(xxhash64($"doc_id"), lit(cfg.numBuckets)).cast("int"))
      .withColumn("salt", pmod(xxhash64($"doc_id", lit(7)), lit(cfg.saltsPerBucket)).cast("int"))

    // resume anti-join against committed lineage — the only join in the
    // job (SURVEY.md §2 P6); the committed side is metadata-small, so
    // it is broadcast (never a shuffle of the corpus side)
    val committedDf = committed.toSeq.toDF("bucket")
    val pending = withKeys.join(broadcast(committedDf), Seq("bucket"), "left_anti")

    val chunkSize = if (cfg.chunkBuckets <= 0) pendingBuckets.size else cfg.chunkBuckets
    val chunks = pendingBuckets.grouped(chunkSize).toVector.take(cfg.maxChunks)
    val bOpts = spark.sparkContext.broadcast(cfg.opts)

    var totals = BucketStats()
    var bucketsDone = 0

    chunks.zipWithIndex.foreach { case (chunk, chunkIdx) =>
      val acc = new BucketStatsAcc
      spark.sparkContext.register(acc, s"${cfg.jobId}-stats-$chunkIdx")

      val sub = pending.filter($"bucket".isin(chunk.map(Integer.valueOf): _*))
      // "bucketed": spread (bucket × salt) combos over tasks (AQE may
      // coalesce); "scan": stay in scan partitions — map-only plan
      val repartitioned = (if (cfg.mode == "bucketed") {
        val parallelism = math.max(spark.sparkContext.defaultParallelism,
          math.min(chunk.size * cfg.saltsPerBucket, 4 * spark.sparkContext.defaultParallelism))
        sub.repartition(parallelism, $"bucket", $"salt")
      } else sub).as[InRow]

      val extracted: Dataset[OutRow] = repartitioned.mapPartitions { it =>
        val opts = bOpts.value
        it.flatMap { row =>
          val res = Extractor.extractDoc(InterleavedDoc(row.doc_id, row.spans), opts)
          acc.add(row.bucket -> BucketStats(
            docCount = 1,
            spanCount = res.spanCount,
            bytesIn = res.bytesIn,
            failedDocs = if (res.doc.isEmpty) 1 else 0))
          res.doc.map(d => OutRow(d.doc_id, d.spans, row.bucket))
        }
      }

      // ONE action: the write. Metrics ride the accumulator.
      val writer = extracted.write.mode("append")
      (if (cfg.mode == "bucketed") writer.partitionBy("bucket") else writer)
        .parquet(TableIO.dataDir(tableDir))

      val stats = acc.value
      val now = System.currentTimeMillis()
      val rows = chunk.map { b =>
        val s = stats.getOrElse(b, BucketStats())
        LineageRow(cfg.jobId, b, s.docCount, s.spanCount, s.bytesIn, s.failedDocs,
          "committed", cfg.attempt, now)
      }
      TableIO.commitLineage(tableDir, f"${cfg.jobId}-a${cfg.attempt}-c$chunkIdx%04d", rows)
      chunk.foreach { b => totals = totals + stats.getOrElse(b, BucketStats()) }
      bucketsDone += chunk.size
    }

    JobStats(committed.size, bucketsDone, totals.docCount, totals.spanCount,
      totals.bytesIn, totals.failedDocs)
  }

  /** Point lookup on the output table ≡ the reference's
    * `GET /content/:id` (/root/reference/api/src/server.ts:182-207):
    * partition-pruned scan, no shuffle. */
  def readDoc(spark: SparkSession, tableDir: String, docId: String): DataFrame =
    spark.read.parquet(TableIO.dataDir(tableDir)).where(col("doc_id") === lit(docId))

  /** Progress view ≡ `GET /progress/:id` (server.ts:157-180): derived
    * from the lineage table, a metadata-scale aggregation. */
  def progress(spark: SparkSession, tableDir: String, jobId: String, totalBuckets: Int): DataFrame = {
    val lin = TableIO.readLineage(spark, tableDir).where(col("job_id") === lit(jobId))
    lin.agg(
      (countDistinct(when(col("status") === "committed", col("bucket"))) * lit(100) / lit(totalBuckets))
        .cast("int").as("progress_pct"),
      sum("doc_count").as("docs"),
      sum("span_count").as("spans"),
      sum("failed_docs").as("failed_docs"))
  }
}
