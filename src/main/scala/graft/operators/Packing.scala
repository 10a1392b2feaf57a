package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEQUENCE PACKING for LM training — the concat-and-chunk scheme of
  * the GPT lineage (documents concatenated in a fixed order, the
  * token stream cut into fixed-length training sequences), emitted as
  * a PACK MANIFEST: one row per (document × sequence) intersection
  * telling a data loader exactly which token span of which sequence
  * each document occupies. Deterministic and integer-exact, so the
  * DuckDB oracle replays it bit-identically.
  *
  * Scale shape: global concat order is inherently sequential, so the
  * stream is SHARDED first (`shard = doc_id % nShards` — the standard
  * distributed-packing move: each shard is an independent stream a
  * loader reads separately). Within a shard the running token offset
  * is a per-entity window (partitioned by shard — the sessionization
  * shape, parallel across shards, never a global sort), and the
  * doc→sequence fan-out is a map-side `sequence` explode. One
  * Exchange on the shard key total.
  */
object Packing {

  /** Pack manifest: (shard, seq_idx, doc_id, seq_begin, seq_end,
    * tokens_in_seq) — the document occupies sequence `seq_idx`'s token
    * positions [seq_begin, seq_end] (inclusive, within [0, seqLen)).
    * A document longer than its sequence remainder spans several
    * consecutive sequences (no padding, no document loss — the
    * concat-and-chunk contract). */
  def sequencePack(docs: DataFrame, seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val counted = docs.select(col("doc_id"),
      (col("doc_id") % nShards).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counted
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_idx", explode(sequence(
        expr(s"off div $seqLen"),
        expr(s"(off + n_tokens - 1) div $seqLen"))))
      .select(col("shard"), col("seq_idx"), col("doc_id"),
        greatest(col("off") - col("seq_idx") * seqLen, lit(0L)).as("seq_begin"),
        (least(col("off") + col("n_tokens") - col("seq_idx") * seqLen,
          lit(seqLen.toLong)) - 1).as("seq_end"))
      .withColumn("tokens_in_seq", col("seq_end") - col("seq_begin") + 1)
  }
}
