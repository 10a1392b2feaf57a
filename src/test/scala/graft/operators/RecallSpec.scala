package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.RecallProbe

/** Retrieval-quality FLOORS for the approximate operators at their
  * committed default knobs — the regression net the exactness oracle
  * cannot provide: the driver's DuckDB oracle replays the same
  * algorithm, so a knob regression (band count, lshBits, nProbe) that
  * silently destroys recall stays hash-exact there. These tests pin
  * recall ≥ floor on corpora where the defaults are RIGHT-SIZED
  * (clustered embeddings / token-edit near-dup docs — the workload
  * these operators exist for); `graft.tools.RecallProbe` reports the
  * same metrics on the sf corpus for the committed record. */
class RecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  /** 32 tight clusters of 8 vectors in 64-dim: a cluster center with
    * ±0.05 seeded jitter per member — the near-dup retrieval workload.
    * Exact top-7 of any member is its 7 clustermates (cross-cluster
    * dot products are far lower by construction). */
  private lazy val clustered = {
    val rnd = new scala.util.Random(97)
    val centers = Vector.fill(32)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val rows = for {
      c <- 0 until 32
      m <- 0 until 8
    } yield {
      val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      ((c * 8 + m).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").localCheckpoint()
  }

  test("ANN recall floors at default knobs on a clustered corpus (brute=1.0 sanity included)") {
    val queries = clustered.where($"vec_id" % 8 === 0) // one per cluster
    val k = 7
    val truth = Similarity.bruteForceTopK(queries, clustered, k).localCheckpoint()
    assert(RecallProbe.recallAtK(truth, Similarity.bruteForceTopK(queries, clustered, k)) == 1.0)

    val lsh = RecallProbe.recallAtK(truth,
      Similarity.lshTopK(queries, clustered, k, lshBits = 4))
    val multi = RecallProbe.recallAtK(truth,
      Similarity.lshTopKMulti(queries, clustered, k, lshBits = 4, tables = 2))
    val ivf = RecallProbe.recallAtK(truth,
      Similarity.ivfTopK(queries, clustered, k, numCentroids = 8, nProbe = 2))
    val ivfKm = RecallProbe.recallAtK(truth,
      Similarity.ivfTopKKmeans(queries, clustered, k,
        numCentroids = 8, nProbe = 2, iterations = 2))
    // clustermates share the query's sign pattern (jitter ≪ |center
    // coords| in expectation), so bucketed search must find ~all of
    // them; a band/bits/probe sizing regression lands well below this
    assert(lsh >= 0.90, s"single-table LSH recall@$k = $lsh < 0.90")
    assert(multi >= 0.95, s"multi-table LSH recall@$k = $multi < 0.95")
    assert(multi >= lsh, s"multi-table ($multi) must not trail single-table ($lsh)")
    assert(ivf >= 0.90, s"IVF recall@$k = $ivf < 0.90")
    assert(ivfKm >= 0.90, s"IVF-kmeans recall@$k = $ivfKm < 0.90")
  }

  /** PQ recall is codebook-quality-bound: its codewords are the first
    * `codebookSize` item subvectors, so the corpus is labeled
    * MEMBER-MAJOR (vec_id = member·32 + cluster) — the first 16 ids
    * span 16 DIFFERENT clusters, the stand-in for k-means-trained
    * codebooks (same contract as the coarse seeds of ivfTopK). */
  private lazy val clusteredMm = {
    val rnd = new scala.util.Random(97)
    val centers = Vector.fill(32)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val rows = for {
      c <- 0 until 32
      m <- 0 until 8
    } yield {
      val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      ((m * 32 + c).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").localCheckpoint()
  }

  test("IVF-PQ recall floor at default knobs on a clustered corpus with cluster-spanning codebooks") {
    val queries = clusteredMm.where($"vec_id" < 32) // member 0 of every cluster
    val k = 7
    val truth = Similarity.bruteForceTopK(queries, clusteredMm, k).localCheckpoint()
    val pq = RecallProbe.recallAtK(truth,
      Similarity.ivfPqTopK(queries, clusteredMm, k,
        numCentroids = 8, nProbe = 2, numSub = 4, codebookSize = 16))
    // clustermates quantize to their cluster's nearest codeword tuple;
    // loss comes from coarse-boundary straddle + cross-cluster code
    // collisions — both bounded on tight clusters
    assert(pq >= 0.85, s"IVF-PQ recall@$k = $pq < 0.85")
    // exact re-rank over a 4k shortlist recovers quantization-tie
    // losses: never below the plain PQ ranking
    val rr = RecallProbe.recallAtK(truth,
      Similarity.ivfPqTopKRerank(queries, clusteredMm, k, shortlist = 4 * k,
        numCentroids = 8, nProbe = 2, numSub = 4, codebookSize = 16))
    assert(rr >= pq, s"rerank recall ($rr) must not trail PQ ($pq)")
    assert(rr >= 0.90, s"IVF-PQ+rerank recall@$k = $rr < 0.90")
    // LEARNED codebooks: Lloyd-refined codewords track cluster means
    // instead of echoing seed members — recall must hold the seeded
    // floor and never trail the seeded PQ on this corpus
    val km = RecallProbe.recallAtK(truth,
      Similarity.ivfPqTopKKmeans(queries, clusteredMm, k,
        numCentroids = 8, nProbe = 2, numSub = 4, codebookSize = 16,
        iterations = 2))
    assert(km >= 0.85, s"IVF-PQ-kmeans recall@$k = $km < 0.85")
    assert(km >= pq, s"learned codebooks ($km) must not trail seeded PQ ($pq)")
  }

  /** 40 base docs × 3 variants (base + two one-token edits): every
    * variant pair has 3-gram Jaccard well above 0.5, so the exact
    * ground-truth pair set is the within-group pairs. */
  private lazy val nearDupDocs = {
    val vocab = Vector.tabulate(400)(i => s"tok$i")
    val rnd = new scala.util.Random(53)
    val groups = for (g <- 0 until 40) yield {
      val base = Vector.fill(30)(vocab(rnd.nextInt(vocab.size)))
      (0 until 3).map(v =>
        ((g * 3 + v).toLong,
          (if (v == 0) base else base.updated(7 + v * 5, s"edit${g}_$v")).mkString(" ")))
    }
    groups.flatten.toDF("doc_id", "text").localCheckpoint()
  }

  /** Like [[nearDupDocs]] but 100-token docs: a one-token edit moves
    * the 32-bit simhash by ~2-4 bits there (vote sums scale with
    * doc length), which is the regime the hamming-3 block index is
    * FOR — the 30-token corpus above mutates ~1/30th of the votes per
    * edit and inherently lands past the radius. */
  private lazy val nearDupDocs100 = {
    val vocab = Vector.tabulate(400)(i => s"tok$i")
    val rnd = new scala.util.Random(53)
    val groups = for (g <- 0 until 40) yield {
      val base = Vector.fill(100)(vocab(rnd.nextInt(vocab.size)))
      (0 until 3).map(v =>
        ((g * 3 + v).toLong,
          (if (v == 0) base else base.updated(7 + v * 5, s"edit${g}_$v")).mkString(" ")))
    }
    groups.flatten.toDF("doc_id", "text").localCheckpoint()
  }

  test("simhash star-pair cluster recall ≥ 0.9 vs exact Jaccard truth (100-token docs, default knobs)") {
    val truthPairs = Dedup.ngramJaccardPairs(nearDupDocs100, minPermille = 500)
      .localCheckpoint()
    assert(truthPairs.count() >= 40, "fixture must actually contain near-dup pairs")
    val labels = Dedup.componentsStar(Dedup.simhashStarPairs(nearDupDocs100))
    val recall = RecallProbe.pairClusterRecall(truthPairs, labels)
    // a block-count / key-width / maxHamming regression craters this
    assert(recall >= 0.90, s"simhash star cluster recall = $recall < 0.90")
  }

  /** 32 clusters of 8 in 64-dim with SIGN-GUARDED centers (|coord| ≥
    * 0.3, so ±0.05 jitter never flips an LSH sign bit) — the corpus
    * where bucket knobs are right-sized: lshBits=4 keeps every cluster
    * in one bucket for the all-pairs generator; lshBits=10 gives the
    * STAR generator ≥1 bucket per cluster (the star contract: bucket ≈
    * duplicate group, sized via lshBitsFor). */
  private lazy val clusteredGuarded = {
    val rnd = new scala.util.Random(97)
    def coord(): Float = {
      val x = rnd.nextFloat() * 2f - 1f
      if (math.abs(x) < 0.3f) (if (x < 0) x - 0.3f else x + 0.3f) else x
    }
    val centers = Vector.fill(32)(Array.fill(64)(coord()))
    val rows = for { c <- 0 until 32; m <- 0 until 8 } yield {
      val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      ((c * 8 + m).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").localCheckpoint()
  }

  test("embedding near-dup recall floors: all-pairs generator ≥ 0.95, star cluster recall ≥ 0.95") {
    import graft.functions.{VectorFunctions => VF}
    val q = clusteredGuarded
      .select(col("vec_id"), VF.quantize(col("embedding")).as("qv"))
      .withColumn("nsq", VF.normSqQ(col("qv"))).localCheckpoint()
    val truth = q.as("l").join(q.as("r"), col("l.vec_id") < col("r.vec_id"))
      .withColumn("dot", VF.dotQ(col("l.qv"), col("r.qv")))
      .where(VF.cosineGePct(col("dot"), col("l.nsq"), col("r.nsq"), 80))
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"))
      .localCheckpoint()
    assert(truth.count() >= 800, "fixture must contain the within-cluster pairs")
    // all-pairs-in-bucket generator: every truth pair surfaces
    val flat = Dedup.embeddingNearDupPairs(clusteredGuarded, tPct = 80, lshBits = 4)
      .select($"a_id", $"b_id")
    val flatSym = flat.unionAll(flat.select($"b_id".as("a_id"), $"a_id".as("b_id")))
    val flatRecall = truth.join(flatSym, Seq("a_id", "b_id"), "left_semi").count()
      .toDouble / truth.count()
    assert(flatRecall >= 0.95, s"embedding pair recall = $flatRecall < 0.95")
    // star generator: linear output, judged on CLUSTER recall (star
    // pairs are canon-member edges by design, not all pairs)
    val star = Dedup.embeddingNearDupStarPairs(clusteredGuarded, tPct = 80, lshBits = 10)
    val labels = Dedup.components(star.select($"a_id", $"b_id"), iterations = 3)
    val starRecall = RecallProbe.pairClusterRecall(truth, labels)
    assert(starRecall >= 0.95, s"embedding star cluster recall = $starRecall < 0.95")
  }

  test("minhash star-pair cluster recall ≥ 0.9 vs exact Jaccard ground truth at default knobs") {
    val truthPairs = Dedup.ngramJaccardPairs(nearDupDocs, minPermille = 500)
      .localCheckpoint()
    assert(truthPairs.count() >= 40, "fixture must actually contain near-dup pairs")
    val labels = Dedup.componentsStar(Dedup.minhashLshStarPairs(nearDupDocs))
    val recall = RecallProbe.pairClusterRecall(truthPairs, labels)
    assert(recall >= 0.90, s"star cluster recall = $recall < 0.90")
    // and the direct LSH pair generator on the same banding knobs
    val lshPairs = Dedup.minhashLshPairs(nearDupDocs)
      .select($"a_id", $"b_id").localCheckpoint()
    val sym = lshPairs.unionAll(lshPairs.select($"b_id".as("a_id"), $"a_id".as("b_id")))
    val hit = truthPairs.select("a_id", "b_id")
      .join(sym, Seq("a_id", "b_id"), "left_semi").count()
    val recallPairs = hit.toDouble / truthPairs.count()
    assert(recallPairs >= 0.90, s"LSH pair recall = $recallPairs < 0.90")
  }
}
