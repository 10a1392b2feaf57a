package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph-centrality operators over edge tables — the link-graph
  * quality signals corpus curation weights documents by (Common Crawl
  * publishes its host ranking from exactly this family of centrality
  * computations over the crawl's link graph; PageRank: Page, Brin,
  * Motwani, Winograd 1999).
  *
  * Exactness design: ranks are integer micro-units (initial rank
  * 10^6 per node) and every update is floor arithmetic —
  * `contribution = rank div outdeg`, `rank' = (1000−d)·10³ +
  * (d·inflow) div 10³` with damping d in permille — so an external
  * engine replays the exact integers; no float summation order, no
  * convergence epsilon to pin. (Floor division leaks a few
  * micro-units per step — fine: the DETERMINISTIC fixed-point ladder
  * is the contract, not stochastic-matrix conservation.)
  *
  * Shape at 100 TB: one iteration = one join of the edge table with
  * the rank table on src (both partitioned by the join key — at scale
  * co-partition/bucket both by id and the join is shuffle-free), one
  * hash aggregation on dst (map-side partials collapse hot in-degree
  * nodes before the shuffle — the skew path), one left join back to
  * the node set. O(iterations) rounds, each shuffle-once; rank frames
  * are truncated per round ([[Dedup.defaultTruncate]]) so the logical
  * plan stays O(1) — the componentsStar lesson. Dangling nodes
  * (outdeg 0) absorb rank and contribute none, declared. */
object Graphs {

  /** `iterations` rounds of damped integer PageRank over
    * `edges(src, dst)`. Output: (id, pr) for every node appearing as
    * src or dst. */
  def pageRank(edges: DataFrame, iterations: Int = 3,
      dampingPermille: Int = 850,
      truncate: DataFrame => DataFrame = Dedup.defaultTruncate): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0,1000], got $dampingPermille")
    // materialize the edge table once: it is referenced by the node
    // set, the degree aggregation AND every iteration's join — an
    // untruncated upstream (corpus scan + synthetic-edge derivation)
    // would re-execute per round
    val e = truncate(edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = truncate(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
    // out-degrees are loop-invariant: truncate once or every round
    // re-runs the degree aggregation over the full edge table
    val outdeg = truncate(e.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val base = (1000L - dampingPermille) * 1000L
    val wide = DecimalType(38, 0)
    var ranks = nodes.select(col("id"), lit(1000000L).as("pr"))
    for (_ <- 0 until iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
      // the hub-node inflow sum AND the d·inflow product both run in
      // DECIMAL(38,0): a long sum would wrap silently near 2^63 total
      // contribution (within 10× of the 10^12-node design point) —
      // widen like the cosine threshold does. The DuckDB twin's
      // BIGINT-into-HUGEINT sum is exact the same way.
      val inflow = contrib.groupBy("id")
        .agg(sum(col("c").cast(wide)).as("inflow"))
      ranks = truncate(nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + floor(coalesce(col("inflow"), lit(0L).cast(wide)) *
            dampingPermille / 1000).cast("long")).as("pr")))
    }
    ranks
  }
}
