package graft.tools

import graft.spark.{Queries, Sessions}

/** Ad-hoc query timing: `runMain graft.tools.QueryTime q1 q2 ...`
  * (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS) — one warmup + one
  * timed run per query, like the Bench query section. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-querytime")
    // sort-preserving action, same as Bench (plain count() drops the
    // final ORDER BY via EliminateSorts)
    def runFullPlan(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.execute().count()
    args.foreach { name =>
      val fn = Queries.all(name)
      runFullPlan(fn(spark, sfDir)) // warmup
      val t0 = System.nanoTime()
      val n = runFullPlan(fn(spark, sfDir))
      println(f"QT $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    spark.stop()
  }
}
