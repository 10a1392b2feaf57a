package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the LATEST right row
  * with `right.time <= left.time` in the same key group — the standard
  * enrichment join for event streams (each event sees the most recent
  * prior dimension state), which Spark has no built-in operator for.
  *
  * Re-expressed relationally instead of a per-row range probe: tag and
  * UNION both sides, then per key a running `last(payload, ignoreNulls)`
  * over (time, side) carries the latest right payload forward onto
  * every left row. Cost: ONE shuffle + sort on (key, time) — linear,
  * no range join, no broadcast of either side, and AQE-safe. Ties
  * (right.time == left.time) are visible to the left row, matching
  * DuckDB's `ASOF JOIN ... ON l.t >= r.t` (the oracle twin).
  *
  * At 10^12 rows this is the shape you want: both sides shuffle once
  * on the key; a skewed key serializes only its own sort partition.
  */
object AsOfJoin {

  /** `left` keeps all its columns; `right` contributes `payloadCols`
    * (null when the left row has no prior right row). Both sides must
    * carry `keys` and `timeCol`. Right rows must be unique per
    * (keys, timeCol) — pre-aggregate otherwise (determinism). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val base = keys :+ timeCol
    // side 0 sorts before side 1 at equal time: a right row AT the
    // left row's time is visible (<= semantics)
    val l = left.select(
      base.map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.filterNot(base.contains).map(col) :+ lit(1).as("__side"): _*)
    val r = right.select(
      base.map(col) ++
        payloadCols.map(col) ++
        leftCols.filterNot(base.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(l.unionAll(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
