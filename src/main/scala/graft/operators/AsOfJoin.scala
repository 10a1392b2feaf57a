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
    * (keys, timeCol) — pre-aggregate otherwise (determinism).
    *
    * All payload columns are carried forward in ONE struct (non-null
    * exactly on right rows), so every payload value on a left row
    * comes from the SAME latest right row — filling each column
    * independently would skip a right row's null payload value and mix
    * values from different right rows, diverging from ASOF JOIN
    * semantics. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val base = keys :+ timeCol
    val pType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)).toArray)
    // side 0 sorts before side 1 at equal time: a right row AT the
    // left row's time is visible (<= semantics)
    val l = left.select(
      base.map(col) ++
        leftCols.filterNot(base.contains).map(col) :+
        lit(null).cast(pType).as("__p") :+ lit(1).as("__side"): _*)
    val r = right.select(
      base.map(col) ++
        leftCols.filterNot(base.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("__p") :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionAll(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
