package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.model._
import graft.job.ExtractJob
import graft.spark.InterleavedTable

/** Source-format round trips: the SAME corpus read back through
  * jsonl and csv+json-spans must extract span-identically to the
  * parquet path (base64 payloads survive JSON/CSV escaping). */
class CorpusSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-src-$tag").toString

  private def extractAll(input: org.apache.spark.sql.DataFrame): Map[String, Seq[Span]] = {
    import spark.implicits._
    val table = tmp("out")
    ExtractJob.run(spark, input, table, ExtractJob.Config(numBuckets = 4))
    spark.read.parquet(graft.io.TableIO.dataDir(table)).as[ExtractJob.OutRow]
      .collect().map(r => r.doc_id -> r.spans.sortBy(_.order)).toMap
  }

  test("jsonl and csv corpora extract span-identically to parquet (incl. PDF base64 payloads)") {
    import spark.implicits._
    val n = 40
    val docs = spark.range(0, n, 1, 2)
      .map(i => graft.fixtures.InterleavedGen.docWithGolden(i)._1).toDF()
    val pq = tmp("pq"); val jl = tmp("jl"); val cv = tmp("cv"); val oc = tmp("oc")
    docs.write.mode("overwrite").parquet(pq)
    CorpusSource.writeJsonl(docs, jl)
    CorpusSource.writeCsvJsonSpans(docs, cv)
    CorpusSource.writeOrc(docs, oc)

    val viaParquet = extractAll(CorpusSource.parquet(spark, pq))
    val viaJsonl = extractAll(CorpusSource.jsonl(spark, jl))
    val viaCsv = extractAll(CorpusSource.csvJsonSpans(spark, cv))
    val viaOrc = extractAll(CorpusSource.orc(spark, oc))
    assert(viaParquet.size == n)
    assert(viaJsonl == viaParquet, "jsonl round-trip diverged")
    assert(viaCsv == viaParquet, "csv round-trip diverged")
    assert(viaOrc == viaParquet, "orc round-trip diverged")
    // and all equal the goldens
    val exp = InterleavedTable.goldens(spark, n).collect().map(d => d.doc_id -> d.spans).toMap
    assert(viaParquet == exp)
  }
}
