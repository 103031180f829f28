package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.similarity.Ivf

/** Semantic (embedding-space) corpus clustering and deduplication —
  * the SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540, public):
  * k-means-cluster the embedding corpus, then compare pairs ONLY
  * within a cluster, so candidate generation is Σ cᵢ² for bounded
  * cluster sizes cᵢ instead of n² — the third near-dup candidate
  * family next to hash buckets (MinHash/SimHash bands, Dedup.scala)
  * and hyperplane-LSH buckets (embeddingCandidatesOf).
  *
  * Scale story (100 TB): K scales with the corpus (K ≈ n / targetSize,
  * the paper's regime — 100k clusters over 100M+ docs), so per-cluster
  * pair volume stays ~targetSize² and total work is linear in n at
  * fixed targetSize. Lloyd's centroids are k×dim driver bytes and the
  * assignment is ONE referenced-constant codegen projection
  * (Ivf.nearestIdExpr) — no shuffle, no crossJoin. The single shuffle
  * is the self-join on list_id; a cluster that blows past the cap
  * fails LOUDLY (the maxGlobalSvs discipline) instead of silently
  * going quadratic.
  *
  * Contract shape (same discipline as NearDup): plant copies of every
  * `plantEvery`-th vector at exact cosine tiers, pin per-tier recall
  * booleans as SQL-oracle literals. Exact copies co-cluster
  * STRUCTURALLY — the assignment is a deterministic function of the
  * embedding value alone, so identical vectors land in identical
  * clusters — while rotated tiers pin the empirical co-clustering ×
  * threshold recall with margin.
  */
object Semantic {

  import Dedup.PlantOffset

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** K for a target mean cluster size — the knob that keeps
    * within-cluster pair generation linear in the corpus.
    */
  def clusterCount(n: Long, targetSize: Int): Int =
    math.max(8, math.ceil(n.toDouble / targetSize).toInt)

  /** Σ over the corpus of squared distance to the assigned centroid —
    * Lloyd's objective. Centroids are k rows; the join broadcasts.
    */
  private[dedup] def sse(data: DataFrame, centroids: DataFrame): Double =
    Ivf.assignWithVec(data, centroids)
      .join(broadcast(centroids), "list_id")
      .select(aggregate(zip_with(col("embedding"), col("cvec"),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, d2) => acc + d2).as("d2"))
      .agg(sum("d2")).head().getDouble(0)

  /** `corpus_cluster` — k-means corpus clustering with a planted
    * co-assignment contract:
    *
    *  - `exact`: an identical copy of every `plantEvery`-th vector
    *    must land in its original's cluster (STRUCTURAL: assignment is
    *    a pure function of the embedding; recall pinned at 1.0 exact);
    *  - `c99`:   a copy rotated to cosine exactly 0.99 must co-cluster
    *    with recall ≥ minRecallC99 (empirical, margin below observed);
    *  - `fit`:   every cluster id non-empty is not required, but the
    *    final Lloyd objective must not exceed the seed's objective
    *    (monotonicity of Lloyd, pinned with a 1e-6 relative slack for
    *    float re-association), and ≥ half the K lists must be
    *    non-empty (the seed spacing actually spread).
    */
  def clusterRecall(spark: SparkSession, sfDir: String,
                    plantEvery: Int = 10, targetSize: Int = 256,
                    iters: Int = 3, minRecallC99: Double = 0.85): DataFrame = {
    import spark.implicits._
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    NearDup.guardIds(e, "vec_id")
    val base = e.filter(pmod(col("vec_id"), lit(plantEvery)) === 0)
    val planted = e
      .unionByName(base.select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding")))
      .unionByName(NearDup.rotatedTo(base, 0.99)
        .select((col("vec_id") + 2L * PlantOffset).as("vec_id"), col("embedding")))
      .persist()
    try {
      val n = planted.count()
      val k = clusterCount(n, targetSize)
      val init = Ivf.initCentroids(planted, k)
      val cents = Ivf.trainCentroids(planted, k, iters)
      val assigned = Ivf.assign(planted, cents)

      val orig = assigned.filter(col("vec_id") < PlantOffset &&
          pmod(col("vec_id"), lit(plantEvery)) === 0)
        .select(col("vec_id").as("id"), col("list_id").as("l_orig"))
      // one join resolves both tiers: copy k=1 (exact) and k=2 (c99)
      val copies = assigned.filter(col("vec_id") >= PlantOffset)
        .select(pmod(col("vec_id"), lit(PlantOffset)).as("id"),
          (col("vec_id") / PlantOffset).cast("int").as("k"),
          col("list_id").as("l_copy"))
      val co = orig.join(copies, "id")
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("l_copy") === col("l_orig"), 1L).otherwise(0L)).as("n_same"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val nPlanted = base.count()
      def recall(k: Int): (Boolean, Double) = {
        val (np, ns) = co.getOrElse(k, (0L, 0L))
        (np == nPlanted && nPlanted > 0, if (np == 0) 0.0 else ns.toDouble / np)
      }
      val (exactOk, exactR) = recall(1)
      val (c99Ok, c99R) = recall(2)

      val sseInit = sse(planted, init)
      val sseFinal = sse(planted, cents)
      val nonEmpty = cents.count()

      Seq(
        ("c99", c99Ok, c99R >= minRecallC99),
        ("exact", exactOk, exactR >= 1.0),
        ("fit", nonEmpty >= k / 2, sseFinal <= sseInit * (1.0 + 1e-6)))
        .toDF("tier", "planted_ok", "ok").orderBy("tier")
    } finally { planted.unpersist(); () }
  }

  /** Within-cluster candidate pairs with exact cosine — the SemDeDup
    * candidate generator. Input must carry (vec_id, embedding);
    * output (id_a, id_b, cosine), id_a < id_b. The largest cluster is
    * guarded: quadratic blowup fails loudly with the fix (more
    * clusters), never silently burns the cluster.
    */
  def semanticCandidatesOf(data: DataFrame, targetSize: Int = 256,
                           iters: Int = 3, maxClusterFactor: Int = 16): DataFrame = {
    // The caller should hand this a PERSISTED frame: Lloyd makes
    // iters+2 passes and the pair join reads `data` twice more, and
    // without the lineage cut Catalyst's projection collapse
    // substitutes whatever expression tree produced `data` (e.g. the
    // planted-corpus rotation HOFs) INTO every centroid distance term
    // — an expression too large for codegen that then evaluates
    // interpreted, per centroid, per row, per pass (measured as a
    // >100x blowup on the planted contract corpus).
    val n = data.count()
    val k = clusterCount(n, targetSize)
    val cents = Ivf.trainCentroids(data, k, iters)
    val assigned = Ivf.assignWithVec(data, cents)
    val cap = targetSize.toLong * maxClusterFactor
    val maxSz = assigned.groupBy("list_id").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    require(maxSz <= cap,
      s"semantic dedup: largest cluster has $maxSz members (cap $cap). " +
        s"Within-cluster pair generation is quadratic in cluster size — " +
        s"lower targetSize (more clusters) or pre-split the hot region.")
    val a = assigned.select(col("list_id"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = assigned.select(col("list_id"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorOps.cosine(col("e_a"), col("e_b")), 4))
      .select("id_a", "id_b", "cosine")
  }

  /** `dedup_semantic` — SemDeDup recall contract on the graded planted
    * corpus (NearDup.plantedCosineEmbeddings: one rotated copy per
    * cosine tier 0.99/0.97/0.95 of every `plantEvery`-th vector).
    * A planted pair is recovered iff the copy CO-CLUSTERS with its
    * original AND the exact within-cluster cosine clears `tau` —
    * per-tier recall booleans pinned with margin below the observed
    * co-clustering rate, `cosine_ok` pins that the construction landed
    * each found pair at the intended cosine (±0.005).
    */
  /** Per-tier minimum recall pins for the SemDeDup contract. These sit
    * below the LSH pins (NearDup.CosineTiers) because the recall
    * mechanism differs: an LSH miss needs every one of 8 tables to
    * split the pair, while a k-means miss needs only the one Voronoi
    * boundary — co-clustering measured 0.945/0.895/0.865 per tier at
    * sf0.1 (and higher at smaller SFs), pinned with ≥ 0.05 margin.
    */
  val SemanticMinRecall: Map[String, Double] =
    Map("c99" -> 0.85, "c97" -> 0.80, "c95" -> 0.75)

  def semanticDedupRecall(spark: SparkSession, sfDir: String,
                          plantEvery: Int = 10, targetSize: Int = 256,
                          tau: Double = 0.94): DataFrame = {
    import spark.implicits._
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    NearDup.guardIds(e, "vec_id")
    val base = e.filter(pmod(col("vec_id"), lit(plantEvery)) === 0).persist()
    val planted = NearDup.plantedCosineFrom(e, base).persist()
    try {
      val nPlanted = base.count()
      val cands = semanticCandidatesOf(planted, targetSize)
        .filter(col("cosine") >= tau &&
          col("id_a") < PlantOffset && col("id_b") > col("id_a") &&
          (col("id_b") - col("id_a")) % PlantOffset === 0)
        .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      val aggs = NearDup.CosineTiers.flatMap { case (name, cosT, k, _) =>
        Seq(
          count(when(col("k") === k && col("cosine") >= cosT - 0.02, 1)).as(s"n_$name"),
          avg(when(col("k") === k && col("cosine") >= cosT - 0.02, col("cosine"))).as(s"c_$name"))
      }
      val r = cands.agg(aggs.head, aggs.tail: _*).collect()(0)
      NearDup.CosineTiers.map { case (name, cosT, _, _) =>
        val nFound = r.getAs[Long](s"n_$name")
        val meanC = Option(r.getAs[java.lang.Double](s"c_$name")).map(_.toDouble).getOrElse(0.0)
        val recall = if (nPlanted == 0) 0.0 else nFound.toDouble / nPlanted
        (name, nPlanted > 0 && nFound > 0, recall >= SemanticMinRecall(name),
          math.abs(meanC - cosT) <= 0.005)
      }.toDF("tier", "planted_ok", "recall_ok", "cosine_ok").orderBy("tier")
    } finally { planted.unpersist(); base.unpersist(); () }
  }
}
