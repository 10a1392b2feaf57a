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
    * bucket. Approximate (bucket-local recall); the 10^12-scale path.
    * Size `lshBits` with [[VF.lshBitsFor]] so buckets stay ~constant as
    * the corpus grows; use [[lshTopKMulti]] when single-table recall is
    * not enough (a neighbor differing in sign on ONE bucketed dim is
    * invisible to a single table). */
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

  /** IVF (inverted-file) top-k — the other standard ANN scale path
    * next to LSH: items are assigned to their nearest coarse centroid
    * (exact integer L2² over quantized vectors, ties to the smaller
    * centroid id) forming inverted lists — ONE shuffle on the centroid
    * id; each query probes only its `nProbe` nearest lists. Centroids
    * here are deterministic seeds (the first `numCentroids` item
    * vectors) so the DuckDB oracle can reproduce the exact partition —
    * a production deployment would run k-means and persist the
    * centroid table; everything downstream is unchanged.
    *
    * At 10^12 items: assignment is a broadcast (centroids are small)
    * + map + one shuffle; probing scores ~nProbe/numCentroids of the
    * corpus per query instead of all of it. */
  def ivfTopK(queries: DataFrame, items: DataFrame, k: Int,
      numCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    val cent = items.where(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), VF.quantize(col("embedding")).as("cv"))
      .withColumn("cn", VF.normSqQ(col("cv")))
    def assign(df: DataFrame, idName: String, qvName: String, keep: Int) = {
      val v = df.select(col("vec_id").as(idName), VF.quantize(col("embedding")).as(qvName))
        .withColumn("vn", VF.normSqQ(col(qvName)))
      // exact integer L2²: |v-c|² = |v|² - 2·v·c + |c|²
      val d2 = col("vn") - lit(2L) * VF.dotQ(col(qvName), col("cv")) + col("cn")
      val w = Window.partitionBy(idName).orderBy(col("d2"), col("cid"))
      v.crossJoin(broadcast(cent))
        .withColumn("d2", d2)
        .withColumn("crk", row_number().over(w))
        .where(col("crk") <= keep)
        .select(col(idName), col("cid"), col(qvName))
    }
    val lists = assign(items, "item_id", "qv", keep = 1) // inverted lists
    val probes = assign(queries, "query_id", "q_qv", keep = nProbe)
    val scored = broadcast(probes).join(lists, Seq("cid"))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("dot", VF.dotQ(col("q_qv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("item_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "item_id", "dot", "rnk")
  }

  /** Multi-table LSH top-k: `tables` independent sign-LSH bucket
    * tables (table t hashes dims [t·lshBits, (t+1)·lshBits)); a
    * candidate is any item sharing a bucket with the query in ANY
    * table, scored once. Recall recovery: a true neighbor straddling a
    * hyperplane of one table (one sign flipped among its dims) still
    * collides in the other tables — single-table LSH misses it
    * deterministically. Cost: ~tables× the candidate volume of one
    * table — still per-bucket, never all-pairs. */
  def lshTopKMulti(queries: DataFrame, items: DataFrame, k: Int,
      lshBits: Int = 4, tables: Int = 2): DataFrame = {
    def withBuckets(df: DataFrame, idName: String) =
      df.select(col("vec_id").as(idName),
        VF.quantize(col("embedding")).as(s"${idName}_qv"),
        posexplode(array((0 until tables).map(t =>
          VF.signBucket(col("embedding"), lshBits, offset = t * lshBits)): _*))
          .as(Seq("tbl", "bucket")))
    val q = withBuckets(queries, "query_id")
    val it = withBuckets(items, "item_id")
    // a pair colliding in several tables must score once: dedup on ids
    // (dup rows are identical, so the kept row is deterministic)
    val cands = broadcast(q).join(it, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("item_id"))
      .select(col("query_id"), col("item_id"),
        col("query_id_qv").as("q_qv"), col("item_id_qv").as("qv"))
      .dropDuplicates("query_id", "item_id")
    val scored = cands.withColumn("dot", VF.dotQ(col("q_qv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("item_id"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "item_id", "dot", "rnk")
  }
}
