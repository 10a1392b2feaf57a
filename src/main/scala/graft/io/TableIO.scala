package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.model.LineageRow

/** Iceberg-shaped table IO: parquet data files + a lineage/metrics
  * commit log (SURVEY.md §4.3, §7.0 — no Iceberg runtime jar in
  * /opt/spark/jars, so the commit log is a directory of immutable
  * JSON-lines manifests written with write-then-atomic-rename; a real
  * Iceberg catalog slots in behind the same calls).
  *
  * Replaces the reference's Redis status/progress keys
  * (/root/reference/extractor/src/libs/redis.rs:132-183): each
  * manifest append marks a set of buckets `committed`, which is what
  * makes a killed job resumable without re-extracting finished work
  * (north_rule). Manifests are small (one row per bucket) — reading
  * them is a driver-side metadata operation, like Iceberg snapshot
  * metadata, NOT a data-scale scan.
  */
object TableIO {

  def dataDir(tableDir: String): String = s"$tableDir/data"
  def lineageDir(tableDir: String): String = s"$tableDir/lineage"

  /** Append lineage rows as one immutable manifest (atomic rename). */
  def commitLineage(tableDir: String, commitId: String, rows: Seq[LineageRow]): Unit = {
    val dir = Paths.get(lineageDir(tableDir))
    Files.createDirectories(dir)
    val body = rows.map { r =>
      s"""{"job_id":${js(r.job_id)},"bucket":${r.bucket},"doc_count":${r.doc_count},""" +
        s""""span_count":${r.span_count},"bytes_in":${r.bytes_in},"failed_docs":${r.failed_docs},""" +
        s""""status":${js(r.status)},"attempt":${r.attempt},"committed_at":${r.committed_at}}"""
    }.mkString("", "\n", "\n")
    val tmp = dir.resolve(s".tmp-$commitId")
    val fin = dir.resolve(s"commit-$commitId.json")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
  }

  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Buckets already committed for `jobId` — driver-side metadata read
    * (small, like an Iceberg snapshot listing). */
  def committedBuckets(tableDir: String, jobId: String): Set[Int] = {
    val dir = Paths.get(lineageDir(tableDir))
    if (!Files.isDirectory(dir)) return Set.empty
    val jobKey = s""""job_id":${js(jobId)}"""
    val out = scala.collection.mutable.Set.empty[Int]
    Files.list(dir).filter(p => p.getFileName.toString.startsWith("commit-")).forEach { p =>
      Files.readAllLines(p).forEach { line =>
        if (line.contains(jobKey) && line.contains(""""status":"committed"""")) {
          val m = """"bucket":(\d+)""".r.findFirstMatchIn(line)
          m.foreach(mm => out += mm.group(1).toInt)
        }
      }
    }
    out.toSet
  }

  /** Lineage as a DataFrame (for metrics/progress queries). */
  def readLineage(spark: SparkSession, tableDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("job_id", StringType), StructField("bucket", IntegerType),
      StructField("doc_count", LongType), StructField("span_count", LongType),
      StructField("bytes_in", LongType), StructField("failed_docs", LongType),
      StructField("status", StringType), StructField("attempt", IntegerType),
      StructField("committed_at", LongType)))
    val dir = Paths.get(lineageDir(tableDir))
    if (!Files.isDirectory(dir))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(lineageDir(tableDir))
  }

  def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
  }
}
