package graft.spark

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale posture baked in:
  * AQE on (runtime coalesce + skew split), shuffle partitions matched
  * to cores (not the 200 default), UTC for oracle parity.
  */
object Sessions {
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.default.parallelism", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // extraction is CPU-bound at ~KB/doc: 128 MB splits would starve
      // a 32-thread local run on a multi-MB corpus. 8 MB keeps ≥cores
      // splits locally; a real cluster reading 100 TB has ≥10^5 splits
      // at any setting, so this only matters at small scale.
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      // the corpus schema is array<struct<...>> — make sure the scan
      // uses the columnar nested reader, not parquet-mr row assembly
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      // cheaper write path for the CPU-bound extraction sink: LZ4
      // compresses ~3× faster than the snappy default at similar ratio,
      // and the v2 committer skips the double-rename on job commit
      .config("spark.sql.parquet.compression.codec", "lz4")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
