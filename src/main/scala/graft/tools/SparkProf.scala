package graft.tools

import org.apache.spark.sql.functions._
import graft.core.model._
import graft.engine.Extractor
import graft.spark.Sessions

/** Stage-by-stage cost decomposition of the extraction job on an
  * existing corpus parquet — separates scan, typed-encoder, extract,
  * and write costs so optimization attacks the right stage. */
object SparkProf {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-sparkprof")
    import spark.implicits._
    val path = s"$corpus/interleaved_docs.parquet"

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }

    timed("count (scan only)") { spark.read.parquet(path).count() }
    timed("scan+decode spans col") {
      spark.read.parquet(path).select(sum(size(col("spans")))).head().getLong(0)
    }
    timed("typed encode (as[Doc])") {
      spark.read.parquet(path).as[InterleavedDoc].mapPartitions(it => Iterator(it.size)).reduce(_ + _)
    }
    timed("extract (no write)") {
      spark.read.parquet(path).as[InterleavedDoc].mapPartitions { it =>
        val opts = ExtractOptions()
        Iterator(it.map(d => Extractor.extractDoc(d, opts).spanCount).sum)
      }.reduce(_ + _)
    }
    val shm = if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm" else "/tmp"
    (1 to 2).foreach { i =>
      timed(s"extract+write typed #$i") {
        spark.read.parquet(path).as[InterleavedDoc].mapPartitions { it =>
          val opts = ExtractOptions()
          it.flatMap(d => Extractor.extractDoc(d, opts).doc)
        }.write.mode("overwrite").parquet(s"$shm/sparkprof-out")
      }
      graft.io.TableIO.deleteRecursively(s"$shm/sparkprof-out")
    }
    (1 to 2).foreach { i =>
      timed(s"job run (InternalRow) #$i") {
        graft.io.TableIO.deleteRecursively(s"$shm/sparkprof-job")
        graft.job.ExtractJob.run(spark, spark.read.parquet(path),
          s"$shm/sparkprof-job",
          graft.job.ExtractJob.Config(jobId = s"prof-$i")).docs
      }
      graft.io.TableIO.deleteRecursively(s"$shm/sparkprof-job")
    }
    spark.stop()
  }
}
