package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.model._
import graft.job.ExtractJob

/** Physical-plan pins — the "would this survive 100×?" properties,
  * asserted so a regression shows up as a test failure, not a slow
  * cluster bill:
  *
  *  - the scan-mode extraction plan is map-only (no Exchange);
  *  - dimension joins broadcast (no shuffled fact side);
  *  - filters and projections reach the parquet scan (PushedFilters /
  *    pruned ReadSchema);
  *  - the resume anti-join broadcasts the committed (metadata) side.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, "graft-plan-spec")
  private val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan-mode extraction plan has NO shuffle (map-only at any scale)") {
    import spark.implicits._
    val input = InterleavedTable.generate(spark, 50).toDF()
    val withKeys = input
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(64)).cast("int"))
      .withColumn("salt", pmod(xxhash64(col("doc_id"), lit(7)), lit(8)).cast("int"))
      .withColumn("start_page", lit(1)).withColumn("page_count", lit(0))
      .withColumn("engine", lit("tesseract"))
      .withColumn("model", lit(null).cast("string"))
      .as[ExtractJob.InRow]
    val extracted = withKeys.mapPartitions(it =>
      it.flatMap(r => graft.engine.Extractor
        .extractDoc(InterleavedDoc(r.doc_id, r.spans), ExtractOptions()).doc))
    val plan = physical(extracted.toDF())
    assert(!plan.contains("Exchange"), s"unexpected shuffle in map-only plan:\n$plan")
  }

  test("q3: filtered customer dim is broadcast, fact side not shuffled for the dim join") {
    val plan = physical(Queries.q3TopOrders(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q5: all dimension joins are broadcast") {
    val plan = physical(Queries.q5RegionRevenue(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast dim joins, got $broadcasts:\n$plan")
  }

  test("resume anti-join broadcasts the committed side") {
    import spark.implicits._
    val input = InterleavedTable.generate(spark, 50).toDF()
      .withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(64)).cast("int"))
    val committed = broadcast((0 to 5).toDF("bucket"))
    val pending = input.join(committed, Seq("bucket"), "left_anti")
    val plan = physical(pending)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti:\n$plan")
  }

  test("filter + projection are pushed into the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_orderkey") === 42L)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("point lookup plan prunes to the two needed columns of the corpus") {
    val df = Queries.pdfzPointLookup(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,doc00000123)]"),
      s"doc_id filter not pushed:\n$plan")
  }

  test("minhash LSH: signature is MAP-SIDE (no shingle explode/agg); first exchange is the bucket shuffle") {
    val plan = physical(Queries.dedupMinhashLsh(spark, sf))
    // the minhash signature is a native per-row expression (MinHashSigs)
    // posexploded into band rows, and pairs come from ONE
    // groupBy(band,sig) collect_list + pair unfold — the old plans'
    // signature hash-agg over exploded shingles (min(md5(k:sh)) with
    // partial_min) must not exist anywhere
    assert(!plan.contains("partial_min"),
      s"shingle-agg signature path resurfaced:\n${plan.take(4000)}")
    assert(plan.contains("minhash_sigs"),
      s"native map-side signature lost:\n${plan.take(4000)}")
    assert(plan.contains("collect_list"),
      s"one-pass bucket-member pairing lost:\n${plan.take(4000)}")
  }

  test("simhash: the 32-term sketch is evaluated once per side (posexplode, not per-block union)") {
    val plan = physical(Queries.dedupSimhash(spark, sf))
    // each side computes the sketch in ONE Project and posexplodes the 4
    // block keys; the union form had 4 sketch evaluations per side
    val posexplodes = "Generate posexplode".r.findAllIn(plan).size
    assert(posexplodes >= 1 && posexplodes <= 2,
      s"expected block keys via posexplode:\n${plan.take(4000)}")
    // the sketch projection appears once per (docsPlus union branch ×
    // join side) = 4 — each evaluates over DIFFERENT rows (projection
    // pushed through the union), so no row's sketch is computed twice.
    // The per-block union form had 4× that (one per block per side).
    val sketches = "AS sh#\\d+".r.findAllIn(plan).size
    assert(sketches <= 4, s"sketch recomputed per block ($sketches):\n${plan.take(4000)}")
  }

  test("minhash star: bucket canon is a hash aggregation + join (map-side combine), NOT a window over (band,sig)") {
    val plan = physical(Queries.dedupMinhashStar(spark, sf))
    // min(doc_id).over(Window.partitionBy(band, sig)) serialized a
    // mega-bucket (giant duplicate cluster) into one unsplittable
    // window task; the agg+join form (the simhash/embedding star
    // siblings' shape) partial-aggregates the hot bucket map-side
    assert(!plan.contains("Window"),
      s"window canon scale-killer resurfaced:\n${plan.take(4000)}")
    assert(plan.contains("partial_min"),
      s"canon lost its map-side partial min aggregation:\n${plan.take(4000)}")
  }

  test("keep-best: per-cluster argmax is a struct-max hash aggregation (map-side combine), NOT a window") {
    val plan = physical(Queries.dedupKeepBest(spark, sf))
    // row_number().over(partitionBy(cluster)) would serialize a
    // mega-cluster into one unsplittable window task; the struct-max
    // form partial-aggregates a 10k-member cluster's rows map-side
    assert(!plan.contains("Window"),
      s"window argmax scale-killer in keep-best:\n${plan.take(4000)}")
    assert(plan.contains("partial_max"),
      s"argmax lost its map-side partial max:\n${plan.take(4000)}")
  }

  test("jaccard: shingle df is a hash aggregation (map-side partials), NOT a window over sh") {
    val plan = physical(Queries.dedupJaccardCapped(spark, sf))
    // a window over partitionBy(sh) forces ALL rows of a hot shingle
    // into one unsplittable task before the df cap can drop it — the
    // 10^12-doc scale-killer; the agg+join form collapses hot keys
    // map-side and leaves skew to AQE's splittable join handling
    assert(!plan.contains("Window"), s"window-df scale-killer resurfaced:\n${plan.take(4000)}")
    assert(plan.contains("partial_count"),
      s"df subtree lost its map-side partial aggregation:\n${plan.take(4000)}")
  }

  test("containment: same scale shape as jaccard — hash-agg df subtree, no window") {
    val plan = physical(Queries.dedupContainment(spark, sf))
    assert(!plan.contains("Window"), s"window scale-killer in containment:\n${plan.take(4000)}")
    assert(plan.contains("partial_count"),
      s"df subtree lost its map-side partial aggregation:\n${plan.take(4000)}")
  }

  test("bloom pre-filter: production plan joins ONLY the bit set — no corpus-fingerprint join at all") {
    // round-6 verdict: the old single operator broadcast
    // corpusFp.distinct() — the exact thing the bloom filter exists
    // to avoid — into EVERY caller's plan. The production path now
    // touches the corpus only to build the fixed-size bit set.
    val docs = Queries.docsPlus(spark, sf).select("doc_id", "text")
    val batch = docs.where(col("doc_id") % 7 === 0)
    val plan = physical(graft.operators.Dedup.bloomIncrementalFlags(docs, batch))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    val allJoins = "Join".r.findAllIn(plan).size
    assert(broadcasts == 1 && allJoins == broadcasts,
      s"expected exactly ONE broadcast join (the bit set), got $broadcasts broadcast / $allJoins total:\n${plan.take(4000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus fingerprint join leaked into the bloom-only plan:\n${plan.take(4000)}")
  }

  test("bloom witness path: exact truth joins ONLY the flagged minority, without a forced broadcast") {
    val plan = physical(Queries.dedupBloomIncremental(spark, sf))
    // the flagged-minority filter must sit below the exact fp join
    assert(plan.contains("bloom_hit"), s"witness plan lost the flag column:\n${plan.take(4000)}")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1,
      s"expected the bit-set broadcast at minimum, got $broadcasts:\n${plan.take(4000)}")
  }

  test("exact-substring: the corpus is scanned and shingled ONCE (single gram aggregation feeds both consumers)") {
    // round-6 verdict: `def grams` instantiated twice — a second full
    // corpus read + shingle pass at 100 TB. The single per-gram
    // aggregation now carries count + occurrence positions together.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val plan = physical(graft.operators.Dedup.exactSubstringSpans(docs, minTokens = 15))
    val shingles = "shingle_md5s".r.findAllIn(plan).size
    assert(shingles == 1,
      s"expected ONE shingle evaluation, got $shingles:\n${plan.take(4000)}")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 1, s"corpus scanned $scans times:\n${plan.take(4000)}")
  }

  test("CDC chunking is MAP-SIDE: no Window, no token-stream shuffle — the only Exchange is the chunk-fp agg") {
    // round-5 verdict: posexplode + Window.partitionBy(doc_id) shuffled
    // and sorted the fully tokenized corpus (≈3-5× text bytes) twice
    // before the one inherent shuffle; the native CdcChunks expression
    // chunks each doc's intact text in the map task, so the plan is
    // scan → project(cdc_chunks) → explode → partial agg → ONE
    // Exchange(chunk_fp) → final agg
    val plan = physical(graft.operators.Dedup.cdcChunkDuplicates(
      Queries.docsPlus(spark, sf)))
    assert(!plan.contains("Window"),
      s"CDC token-window scale-killer resurfaced:\n${plan.take(4000)}")
    assert(plan.contains("cdc_chunks"),
      s"native map-side chunker missing from plan:\n${plan.take(4000)}")
    // the chunker (and its explode) must sit BELOW every Exchange —
    // i.e. tokens never cross the wire; the plan prints leaves last,
    // so "below" means the cdc_chunks Generate appears AFTER the last
    // Exchange in the string
    assert(plan.lastIndexOf("Exchange") < plan.indexOf("cdc_chunks"),
      s"token stream crosses an Exchange:\n${plan.take(4000)}")
    // two Exchanges of chunk-level rows is the standard two-phase
    // distinct-agg shape (partial (fp,doc) agg → fp agg), both over
    // aggregated chunk fingerprints, never tokens
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected at most the two distinct-agg Exchanges, got $exchanges:\n${plan.take(4000)}")
    assert(plan.contains("partial_max"),
      s"chunk agg lost its map-side partials:\n${plan.take(4000)}")
  }

  test("KMV sketch: bottom-k aggregate runs with map-side partials (mergeable sketch, O(k) buffers)") {
    val plan = physical(Queries.textDistinctKmv(spark, sf))
    assert(plan.contains("partial_bottom_k_distinct") ||
      plan.contains("partial bottom_k_distinct") ||
      (plan.contains("bottom_k_distinct") && plan.contains("Partial")),
      s"bottom-k sketch lost its partial aggregation:\n${plan.take(4000)}")
  }

  test("IVF: item→centroid assignment is a pure map-side argmin expression — no per-item aggregation exchange, no n×C window sort") {
    val plan = physical(Queries.simTopkIvf(spark, sf))
    // round 9: assignment is array_min over the folded broadcast
    // centroid table — the previous min_by aggregation still shuffled
    // one row per item to finalize; now assignment stays in the
    // scan's partitions
    assert(plan.contains("array_min"),
      s"assignment lost its map-side argmin expression:\n${plan.take(4000)}")
    assert(!plan.contains("min_by"),
      s"assignment regressed to a per-item aggregation:\n${plan.take(4000)}")
  }

  test("IVF-PQ: encoding and ADC scoring are hash aggregations with broadcast lookups — windows only on the tiny query side") {
    val plan = physical(Queries.simTopkPq(spark, sf))
    // item→code assignment must be the map-side argmin expression
    // (round 9) — neither a window over (item, sub) serializing the
    // n×K candidate rows nor a per-(item, sub) aggregation exchange
    assert(plan.contains("array_min"),
      s"PQ encoding lost its map-side argmin expression:\n${plan.take(4000)}")
    assert(!plan.contains("min_by"),
      s"PQ encoding regressed to a per-item aggregation:\n${plan.take(4000)}")
    // ADC sum per (query, item) rides a partial-aggregated hash agg
    assert(plan.contains("partial_sum"),
      s"ADC scoring lost its map-side partial sum:\n${plan.take(4000)}")
    // the codebook and LUT reach the item stream as broadcasts, never
    // a shuffled join of the corpus against them
    assert(plan.contains("BroadcastHashJoin"),
      s"PQ lookups are not broadcast joins:\n${plan.take(4000)}")
    // exactly two windows: the nProbe probe ranking and the final
    // top-k — both over the query side (small by contract); one more
    // means the encoding regressed to a window
    val windows = "Window\\b".r.findAllIn(plan).size
    assert(windows == 2, s"expected 2 query-side windows, got $windows:\n${plan.take(4000)}")
  }

  test("IVF-PQ kmeans: trained codebook is a materialized leaf — Lloyd lineage absent from the scoring plan") {
    val plan = physical(Queries.simTopkPqKmeans(spark, sf))
    // same scoring shape as the seeded PQ...
    assert(plan.contains("array_min") && plan.contains("partial_sum") &&
      plan.contains("BroadcastHashJoin"),
      s"PQ-kmeans scoring shape regressed:\n${plan.take(4000)}")
    val windows = "Window\\b".r.findAllIn(plan).size
    assert(windows == 2, s"expected 2 query-side windows, got $windows:\n${plan.take(4000)}")
    // ...and the trained codebook feeds encoder + LUT from ONE
    // materialized table: the Lloyd iterations' mean-recompute
    // aggregation (the element-wise array_long_sum_agg since round 9)
    // must NOT re-instantiate inside the scoring plan — the only
    // codebook aggregates allowed here are the tiny per-subspace/
    // centroid ARRAY FOLDS over the materialized leaf — and only the
    // encoder's + LUT's two subspace splitters remain
    assert(!plan.contains("array_long_sum_agg"),
      s"Lloyd training lineage leaked into the scoring plan:\n${plan.take(4000)}")
    assert(plan.contains("ExistingRDD"),
      s"trained codebook is not a materialized leaf:\n${plan.take(4000)}")
    val gens = "posexplode".r.findAllIn(plan).size
    assert(gens == 2, s"expected the 2 scoring-side subspace splits, got $gens")
  }

  test("funnel window: the conversion-window variant keeps the agg+join shape — still no event-stream window") {
    val plan = physical(Queries.qEventsFunnelWindow(spark, sf))
    assert(!plan.contains("Window"),
      s"event-stream window scale-killer in windowed funnel:\n${plan.take(4000)}")
    assert(plan.contains("partial_min"),
      s"stage times lost their map-side min partials:\n${plan.take(4000)}")
  }

  test("image phash: banded candidates, no cartesian product, no window — exact verify is per-candidate arithmetic") {
    val plan = physical(Queries.dedupImagePhash(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"phash pairs must come from the band join, never all-pairs:\n${plan.take(4000)}")
    assert(!plan.contains("Window"), s"no window belongs here:\n${plan.take(4000)}")
    assert(plan.contains("bit_count"),
      s"exact Hamming verify must ride bit_count:\n${plan.take(4000)}")
  }

  test("corpus report: map-side partial aggregations; no window; the lang rollup is a hash agg") {
    val plan = physical(Queries.pipelineReport(spark, sf))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"report lost its map-side partials:\n${plan.take(4000)}")
    assert(!plan.contains("Window"), s"no window belongs here:\n${plan.take(4000)}")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian belongs here:\n${plan.take(4000)}")
  }

  test("temperature sampling: group stats broadcast back — the corpus itself is never shuffled") {
    val plan = physical(Queries.sampleTemperature(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"group-count join must broadcast:\n${plan.take(4000)}")
    assert(!plan.contains("Window"), s"no window belongs in the keep rule:\n${plan.take(4000)}")
    // the group counts are checkpointed ONCE (deriving n_min from the
    // lazy agg frame would re-instantiate its corpus scan), so the
    // query plan scans the corpus exactly once — the filtered scan
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly 1 corpus scan, got $scans:\n${plan.take(4000)}")
  }

  test("funnel: per-stage min() hash aggregations on the user key — no window over the event stream") {
    val plan = physical(Queries.qEventsFunnel(spark, sf))
    // a window (first_value over user partitions) would serialize a
    // hot user's full event history into one task; the agg+join chain
    // collapses it map-side in the min() partials
    assert(!plan.contains("Window"),
      s"event-stream window scale-killer in funnel:\n${plan.take(4000)}")
    assert(plan.contains("partial_min"),
      s"stage times lost their map-side partial min:\n${plan.take(4000)}")
  }

  test("window top-k: Spark's rank-limit pushdown (WindowGroupLimit) engages — no full-partition sort-and-discard") {
    // InferWindowGroupLimit rewrites filter(row_number<=k over w) into a
    // partial per-partition group limit BEFORE the shuffle — the exact
    // optimization a hand-rolled top-k operator would buy; pinned so a
    // query change that silently breaks the pattern shows up here
    val plan = physical(Queries.qWindowTopN(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank-limit pushdown lost:\n${plan.take(4000)}")
  }

  test("tf-idf: map-side partial aggs for tf/df and the top-3 window rides WindowGroupLimit") {
    val plan = physical(Queries.textTfidfTop3(spark, sf))
    assert(plan.contains("partial_count"),
      s"tf/df aggregations lost their map-side partials:\n${plan.take(4000)}")
    assert(plan.contains("WindowGroupLimit"),
      s"top-3 rank-limit pushdown lost:\n${plan.take(4000)}")
  }

  test("whole-stage codegen covers the scalar aggregation pipeline (q1)") {
    // note: array higher-order functions (textStats) are CodegenFallback
    // by design in Spark — the codegen pin targets the scalar path
    val df = Queries.q1Pricing(spark, sf)
    df.collect() // run THIS plan so AQE finalizes it (count() would plan separately)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the final-plan rendering
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen span:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side partial aggregation:\n$plan")
  }
}
