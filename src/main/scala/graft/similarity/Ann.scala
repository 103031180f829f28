package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2c): brute-force cosine top-k as the exact baseline and
  * a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design: brute-force is probe-broadcast × data (fine when the
  * probe set is small — the common "query a corpus" shape; the corpus
  * side streams, never collected). The LSH path buckets BOTH sides by
  * sign-pattern so the join shuffles on bucket and each candidate list
  * is bucket-local; multi-probe (hamming-1 neighbor buckets) recovers
  * recall lost at bucket boundaries.
  */
object Ann {

  /** Deterministic pseudo-random hyperplanes (fixed LCG seed — no RNG
    * state, reproducible across runs/JVMs).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var state = seed
    def nextGaussianish(): Double = {
      // LCG (Numerical Recipes constants) -> [-1, 1): deterministic and
      // platform-independent; adequate for LSH plane directions.
      state = state * 6364136223846793005L + 1442695040888963407L
      // state >>> 11 keeps 53 bits -> [0, 2^53); divide by 2^53 for
      // [0, 1) then stretch to [-1, 1). (A 2^52 divisor lands in
      // [-1, 3): positively-biased planes skew every LSH bucket.)
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(nPlanes, dim)(nextGaussianish())
  }

  /** Sign-pattern bucket id of a vector against the given planes. */
  def signBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(VectorOps.dot(vec, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** One (table, bucket) struct per hash table — the standard L-table
    * LSH scheme: recall for a pair at angle θ is 1-(1-p^b)^L with
    * p = 1-θ/π, so L tables multiply recall where a single longer code
    * only shrinks it. Explode this array and join on (table, bucket).
    */
  def tableBuckets(vec: Column, nTables: Int, planesPerTable: Int,
                   dim: Int = 64): Column =
    array((0 until nTables).map { t =>
      val planes = hyperplanes(planesPerTable, dim, seed = 42L + t * 7919L)
      struct(lit(t).as("table"), signBucket(vec, planes).as("bucket"))
    }: _*)

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Embedding corpus with planted EXACT duplicates: every
    * `vec_id % plantEvery == 0` vector is copied to
    * `vec_id + offset` verbatim. Identical vectors hash to identical
    * buckets in every LSH table and to the same IVF list, which turns
    * "does the index find the true neighbor" into a deterministic,
    * SQL-expressible contract (the planting rule IS the oracle).
    */
  def plantedEmbeddings(spark: SparkSession, sfDir: String,
                        plantEvery: Int, offset: Long): DataFrame = {
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    e.unionByName(
      e.filter(pmod(col("vec_id"), lit(plantEvery)) === 0)
        .select((col("vec_id") + offset).as("vec_id"), col("embedding")))
  }

  /** Probe-id cap for the gate probe sets (round-14, the sf10 lesson):
    * "every 50th vector" made probes a CORPUS property, so every
    * planted-top-1 gate's cost was probes × scan = quadratic in the
    * corpus — measured 71× at 10× data on ann_ivf_pq. Probes are a
    * WORKLOAD property in any real serving system; bounding the probe
    * ids to the first 20,000 id space keeps the contract deterministic
    * and SQL-expressible (the oracle carries the same literal), is
    * INACTIVE at sf ≤ 1 (max vec_id 19,999 — every committed artifact
    * row is byte-identical), and pins the probe count at 400 beyond,
    * which is what turns the measured sf1→sf10 slope linear.
    */
  val ProbeIdCap = 20000L

  /** The shared gate probe frame: every `probeEvery`-th vector under
    * [[ProbeIdCap]], as (probe_id, probe_vec).
    */
  private[similarity] def gateProbes(e: DataFrame, probeEvery: Int): DataFrame =
    e.filter(pmod(col("vec_id"), lit(probeEvery)) === 0 &&
      col("vec_id") < ProbeIdCap)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))

  /** Exact brute-force cosine top-k: for each probe vector (vec_id %
    * probeEvery == 0 under the [[ProbeIdCap]]), the k nearest others
    * by cosine. Probes are broadcast; the corpus side streams through
    * a single scan.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String, k: Int = 5,
                     probeEvery: Int = 50): DataFrame = {
    val data = emb(spark, sfDir)
    bruteForceTopKOf(data, gateProbes(data, probeEvery), k)
  }

  /** [[bruteForceTopK]] over an arbitrary corpus and probe frame.
    *
    * One corpus scan through [[graft.functions.BruteTopKAgg]]: the
    * probe set rides along as a referenced constant (probes are
    * driver-local bytes by contract — probeEvery / maxProbes bound
    * them) and every partition folds its rows into per-probe k-entry
    * heaps in primitive double[] loops. The broadcast non-equi join
    * this replaces materialized probes × corpus ROWS through the plan
    * — the whole cost of the ground-truth baseline at scale — and its
    * window sort shuffled all of them. Semantics unchanged: cosine
    * rounded HALF_UP to 6 digits before ranking, (cosine desc, id asc)
    * order, self-pairs excluded.
    */
  def bruteForceTopKOf(data: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val rows = probes
      .select(col("probe_id"), transform(col("probe_vec"), x => x.cast("double")).as("pv"))
      .collect()
    val pids = rows.map(_.getLong(0))
    val pvecs = rows.map(_.getSeq[Double](1).toArray)
    data
      .agg(graft.functions.GraftFunctions
        .brute_topk(col("embedding"), col("vec_id"), pids, pvecs, k).as("top"))
      .select(inline(col("top")))
      .orderBy("probe_id", "rk")
  }

  /** LSH-bucketed ANN: L independent hash tables; candidates share the
    * probe's bucket in ANY table, then exact cosine + top-k within
    * candidates. Recall < 1 by construction; the scale path.
    *
    * Scale shape: the bucket join carries ONLY ids — candidate pairs are
    * deduplicated across tables before the embeddings are joined back
    * for exact scoring, so the L-fold banding never multiplies vector
    * payload through a shuffle.
    */
  def lshTopK(spark: SparkSession, sfDir: String, k: Int = 5,
              probeEvery: Int = 50, nTables: Int = 8,
              planesPerTable: Int = 6): DataFrame = {
    val data = emb(spark, sfDir)
    lshTopKOf(data, gateProbes(data, probeEvery), k, nTables, planesPerTable)
  }

  /** [[lshTopK]] over an arbitrary corpus and probe frame — probes need
    * not be corpus members (their buckets are hashed from `probe_vec`).
    */
  def lshTopKOf(data: DataFrame, probes: DataFrame, k: Int,
                nTables: Int, planesPerTable: Int): DataFrame = {
    val banded = data
      .select(col("vec_id"),
        explode(tableBuckets(col("embedding"), nTables, planesPerTable)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
    val probeBands = probes
      .select(col("probe_id"),
        explode(tableBuckets(col("probe_vec"), nTables, planesPerTable)).as("tb"))
      .select(col("tb.table"), col("tb.bucket"), col("probe_id"))
    val pairIds = banded
      .join(probeBands.hint("broadcast"), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id")
      .distinct()
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), col("vec_id"))
    pairIds
      .join(data.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(probes), "probe_id")
      .withColumn("cosine", round(VectorOps.cosine(col("embedding"), col("probe_vec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("probe_id", "rk")
  }

  /** Bounded-probe LSH top-k: identical semantics to [[lshTopKOf]]
    * (candidates share ≥ 1 (table, bucket) with the probe, pairs
    * deduplicated, self excluded, top-k by cosine desc / vec_id asc,
    * cosine rounded to 6 before ranking) as ONE corpus scan through
    * [[graft.functions.KeyedTopKAgg]]. Bucket codes are computed by
    * the SAME [[tableBuckets]] expression on both sides (the probe
    * side collected — probes are bounded by contract), so matching is
    * bit-exact; the per-row visited stamp inside the aggregate plays
    * the role of the join formulation's pair `distinct()`. ONLY for
    * driver-bounded probe sets; unbounded callers use [[lshTopKOf]].
    */
  def lshTopKBounded(data: DataFrame, probes: DataFrame, k: Int,
                     nTables: Int, planesPerTable: Int): DataFrame = {
    val nBuckets = 1 << planesPerTable
    def keysOf(vecCol: Column): Column = transform(
      tableBuckets(vecCol, nTables, planesPerTable),
      tb => (tb.getField("table") * nBuckets + tb.getField("bucket")).cast("int"))
    val pRows = probes
      .select(col("probe_id"),
        transform(col("probe_vec"), x => x.cast("double")).as("pv"),
        keysOf(col("probe_vec")).as("pk"))
      .collect()
    val pids = pRows.map(_.getLong(0))
    val pvecs = pRows.map(_.getSeq[Double](1).toArray)
    val keyProbes = Array.fill(nTables * nBuckets)(Seq.newBuilder[Int])
    pRows.zipWithIndex.foreach { case (r, i) =>
      r.getSeq[Int](2).foreach(keyProbes(_) += i)
    }
    data
      .agg(graft.functions.GraftFunctions.keyed_topk(
        col("embedding"), col("vec_id"), keysOf(col("embedding")),
        pids, pvecs, keyProbes.map(_.result().toArray), k).as("top"))
      .select(inline(col("top")))
      .orderBy("probe_id", "rk")
  }

  /** Oracle-verified LSH query: each probe's exact duplicate is planted
    * in the corpus (see [[plantedEmbeddings]]), and the query returns
    * the top-1 LSH neighbor per probe. Identical vectors share every
    * bucket, so the index MUST return the planted copy at cosine 1.0 —
    * full per-probe recall, hash-checked by pure id arithmetic. The
    * recall-vs-brute-force quality summary remains in [[lshSummary]].
    */
  def lshPlantedTop1(spark: SparkSession, sfDir: String,
                     probeEvery: Int = 50, offset: Long = 1000000L,
                     nTables: Int = 8, planesPerTable: Int = 6): DataFrame = {
    val data = plantedEmbeddings(spark, sfDir, probeEvery, offset)
    val probes = gateProbes(emb(spark, sfDir), probeEvery)
    lshTopKOf(data, probes, k = 1, nTables, planesPerTable)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"))
      .orderBy("probe_id")
  }

  // ------------------------------------------- recall@k on dense clusters

  /** Corpus + a PLANTED DENSE NEIGHBORHOOD around every
    * `vec_id % centerEvery == 0` vector: `members` copies rotated by
    * exact graded angles (cosine 1-0.01j for member j — 0.99 down to
    * 0.88 at the default 12), ids at `center + j*PlantOffset`. Every
    * center thus has MORE true near neighbors than k, at controlled
    * graded distances — the regime where recall@k is a meaningful
    * number rather than a needle-in-haystack detection test.
    */
  def clusteredEmbeddings(spark: SparkSession, sfDir: String,
                          centerEvery: Int = 20, members: Int = 12,
                          offset: Long = 1000000L): DataFrame = {
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    graft.dedup.NearDup.guardIds(e, "vec_id")
    val centers = e.filter(pmod(col("vec_id"), lit(centerEvery)) === 0)
    // one-scan fan-out (bit-identical to a fold of rotatedTo unions —
    // spec-pinned); a 12-branch union was the dominant corpus-build cost
    e.unionByName(
      graft.dedup.NearDup.gradedMembers(centers, members)
        .select((col("vec_id") + col("j") * offset).as("vec_id"), col("embedding")))
  }

  /** Deterministic hash-sample of at most `maxProbes` probe rows from a
    * centers frame: hash-ordered top-k (TakeOrderedAndProject — fully
    * distributed, no global sort materialized), so the sample is stable
    * across runs and independent of id layout. Recall contracts use this
    * to keep their brute-force ground truth (probes × corpus) LINEAR in
    * the corpus: probe counts that scale with the data make any recall
    * harness quadratic by contract, whatever the index does. Below the
    * cap every center is kept, so small-SF behavior is unchanged.
    */
  def sampleProbes(centers: DataFrame, maxProbes: Int): DataFrame =
    centers
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .orderBy(pmod(xxhash64(col("probe_id")), lit(1000003L)), col("probe_id"))
      .limit(maxProbes)

  /** The shared recall-contract scaffold: the eagerly-materialized
    * clustered corpus, the hash-sampled center probes, the one-scan
    * brute-force ground truth, and the recall function against it —
    * ONE implementation for every index family's contract
    * (annRecallAtK's LSH/IVF, Hnsw.annHnsw, tools/HnswProbe), so the
    * probe-sampling and ground-truth rules cannot silently drift apart
    * between methods.
    */
  final case class RecallHarness(data: DataFrame, probes: DataFrame,
                                 nProbes: Long, brute: DataFrame, nTruth: Long) {
    def recallOf(ann: DataFrame): Double = {
      val hits = brute.join(ann.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id")).count()
      if (nTruth == 0) 0.0 else hits.toDouble / nTruth
    }
  }

  def recallHarness(spark: SparkSession, sfDir: String, k: Int,
                    centerEvery: Int = 20, members: Int = 12,
                    maxProbes: Int = 2000): RecallHarness = {
    // one eager materialization shared by every pipeline (brute + the
    // indexes under test — plus k-means passes inside ivf); probes
    // hash-sampled to the cap so the brute-force ground truth stays
    // corpus-linear
    val data = clusteredEmbeddings(spark, sfDir, centerEvery, members).localCheckpoint()
    val probes = sampleProbes(
      data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(centerEvery)) === 0),
      maxProbes)
      .localCheckpoint()
    val nProbes = probes.count()
    val brute = bruteForceTopKOf(data, probes, k)
      .select("probe_id", "neighbor_id").localCheckpoint()
    RecallHarness(data, probes, nProbes, brute, brute.count())
  }

  /** recall@k contract for BOTH ANN indexes over the clustered corpus:
    * each center probes for its top-k; ground truth is the engine's own
    * exact brute force over the same corpus (its per-neighbor ranking
    * is separately oracle-verified by ann_bruteforce); realized recall
    * must clear a per-method pin. Output: one oracle-pinned boolean row
    * per method. This is THE number an ANN user quotes — recall@k among
    * genuinely dense competition, not planted-copy top-1 detection.
    */
  def annRecallAtK(spark: SparkSession, sfDir: String, k: Int = 10,
                   centerEvery: Int = 20, members: Int = 12,
                   minRecallLsh: Double = 0.95, minRecallIvf: Double = 0.95,
                   maxProbes: Int = 2000): DataFrame = {
    import spark.implicits._
    val h = recallHarness(spark, sfDir, k, centerEvery, members, maxProbes)
    // bounded-probe scan variants (probes are capped above): identical
    // semantics, no candidate-pair shuffle — parity spec-pinned. The two
    // index measurements are independent — concurrent jobs (guide §2.6)
    val (lshRecall, ivfRecall) = graft.util.Par.par2(
      h.recallOf(lshTopKBounded(h.data, h.probes, k, nTables = 8, planesPerTable = 6)),
      h.recallOf(Ivf.ivfTopKBounded(h.data, h.probes, k, nLists = 16, nProbe = 4)))
    Seq(
      ("ivf", h.nProbes > 0, ivfRecall >= minRecallIvf),
      ("lsh", h.nProbes > 0, lshRecall >= minRecallLsh))
      .toDF("method", "planted_ok", "recall_ok").orderBy("method")
  }

  /** Single-row LSH-ANN quality summary: probe count, result count, and
    * recall against the exact brute-force top-k — the metric that
    * certifies the scale path is trustworthy before pointing it at the
    * full corpus.
    */
  def lshSummary(spark: SparkSession, sfDir: String, k: Int = 5,
                 probeEvery: Int = 50, nTables: Int = 8,
                 planesPerTable: Int = 6): DataFrame = {
    // Full-outer join of the two result sets, then ONE aggregation —
    // a single Spark job instead of four separate count() actions
    // (each of which would recompute or re-read the pipelines).
    val brute = bruteForceTopK(spark, sfDir, k, probeEvery)
      .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_brute"))
    val lsh = lshTopK(spark, sfDir, k, probeEvery, nTables, planesPerTable)
      .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_lsh"))
    brute.join(lsh, Seq("probe_id", "neighbor_id"), "full_outer")
      .agg(
        countDistinct(when(col("in_brute") === 1, col("probe_id"))).as("n_probes"),
        count(col("in_lsh")).as("n_lsh_results"),
        count(col("in_brute")).as("n_brute_results"),
        count(when(col("in_brute") === 1 && col("in_lsh") === 1, 1)).as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / greatest(col("n_brute_results"), lit(1L)), 4))
  }
}
