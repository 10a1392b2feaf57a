package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, same ranking function (exact integer dot product over
  * milliunit-quantized vectors — see [[graft.functions.VectorFunctions]]):
  *
  *  - [[bruteForceTopK]]: every query × every item — the correctness
  *    baseline, O(Q·N), broadcast the (small) query side;
  *  - [[lshTopK]]: sign-LSH bucket join — each query only scores items
  *    in its bucket. At 10^12 items with B buckets the scored set
  *    shrinks ×B; recall is tuned by `lshBits` (fewer bits = bigger
  *    buckets = higher recall).
  *
  * Ranking is by integer dot (MIPS ordering), tie-broken by item id —
  * fully deterministic, so top-k sets are stable across engines/runs.
  */
object Similarity {

  private def prep(emb: DataFrame, idCol: String) =
    emb.select(col(idCol), VF.quantize(col("embedding")).as("qv"))

  /** Exact top-k by dot product for each query vector. `queries` and
    * `items` both have (vec_id, embedding). Output:
    * (query_id, item_id, dot, rank). Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, items: DataFrame, k: Int): DataFrame = {
    val q = prep(queries, "vec_id").withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("qv", "q_qv")
    val it = prep(items, "vec_id").withColumnRenamed("vec_id", "item_id")
    val scored = broadcast(q).crossJoin(it)
      .where(col("query_id") =!= col("item_id"))
      .withColumn("dot", VF.dotQ(col("q_qv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("item_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "item_id", "dot", "rnk")
  }

  /** LSH-bucketed top-k: queries only score items in their sign-LSH
    * bucket. Approximate (bucket-local recall); the 10^12-scale path. */
  def lshTopK(queries: DataFrame, items: DataFrame, k: Int, lshBits: Int = 4): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      VF.signBucket(col("embedding"), lshBits).as("bucket"),
      VF.quantize(col("embedding")).as("q_qv"))
    val it = items.select(col("vec_id").as("item_id"),
      VF.signBucket(col("embedding"), lshBits).as("bucket"),
      VF.quantize(col("embedding")).as("qv"))
    val scored = broadcast(q).join(it, Seq("bucket"))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("dot", VF.dotQ(col("q_qv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("item_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "item_id", "dot", "rnk")
  }
}
