package graft.operators

import org.apache.spark.sql.SparkSession
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
