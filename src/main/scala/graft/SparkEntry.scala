package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.spark.{Queries, Oracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[graft.spark.Queries]]; DuckDB oracle twins in
  * [[graft.spark.Oracles]] (keys without an oracle are rows-only
  * checks: the extraction core is verified against by-construction
  * goldens in `sbt test` and by the extract_parity query instead). */
object SparkEntry {

  /** Flagship on sf=0.001-scale input: extract the deterministic
    * interleaved corpus (PDF/HTML/text/media docs) into output spans.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.extractSpans(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator (SURVEY.md §2 + training-data
    * pipeline extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB twins for every SQL-expressible query. */
  def oracleSql: Map[String, String] = Oracles.sql
}
