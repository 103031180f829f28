package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** GRADED near-duplicate planting — the recall contracts under real
  * near-dups, not just exact copies.
  *
  * The round-2 planted oracles demonstrated recall on easy targets
  * (verbatim copies at cosine 1.0, one appended token at Jaccard ~0.95).
  * This module plants TIERS of genuinely-near duplicates:
  *
  *  - text: keep the first 85% / 70% / 55% of a document's tokens —
  *    word-3-gram Jaccard lands at ≈ the kept fraction, exercising the
  *    minhash banding exactly where its collision probability
  *    1-(1-J^r)^b starts to bend (J=0.55 → ≈0.79 at 16×4);
  *  - text: replace every 30th / 15th token — small scattered edits,
  *    the SimHash regime (few flipped fingerprint bits);
  *  - embeddings: rotate by an exact angle toward a deterministic
  *    per-id direction — planted cosine is EXACTLY cos θ (0.99 / 0.97 /
  *    0.95), exercising hyperplane LSH at p = 1-θ/π per plane.
  *
  * Contract shape: per-tier realized recall is compared against a
  * threshold set WITH MARGIN below the analytic expectation, and the
  * booleans are pinned as literals in the SQL oracle. The pipelines are
  * deterministic (fixed hash seeds, fixed planting), so the booleans
  * are stable at every scale factor — but detuning a knob (fewer
  * bands/tables, narrower multiprobe, coarser signatures) drops
  * realized recall below the pin and breaks the hash check in CI.
  */
object NearDup {

  import Dedup.PlantOffset

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ------------------------------------------------------- text planting

  /** (tier name, kept token fraction ≈ target Jaccard, id-offset multiple,
    * minimum recall pinned by the oracle).
    * Analytic recall at 16 bands × 4 rows: J=0.85 → ~1.0, J=0.70 →
    * ~0.99, J=0.55 → ~0.79; pins sit well under those.
    */
  val JaccardTiers: Seq[(String, Double, Int, Double)] = Seq(
    ("j85", 0.85, 1, 0.90),
    ("j70", 0.70, 2, 0.80),
    ("j55", 0.55, 3, 0.50))

  /** First `frac` of the whitespace tokens, re-joined. Truncation (vs
    * scattered edits) keeps word-3-gram Jaccard ≈ frac: of S ≈ T-2
    * shingles, the kept prefix preserves ≈ frac·T-2 of them and
    * introduces none.
    */
  private[graft] def truncateTokens(text: Column, frac: Double): Column = {
    val toks = Dedup.tokens(text)
    concat_ws(" ", slice(toks, lit(1), greatest(ceil(size(toks) * frac), lit(3)).cast("int")))
  }

  /** Docs eligible for near-planting: long enough that tier fractions
    * are meaningfully separated (60+ tokens → ≥ 9 tokens between tiers).
    */
  private[graft] def eligibleDocs(spark: SparkSession, sfDir: String, plantEvery: Int,
                                  minTokens: Int): DataFrame =
    docs(spark, sfDir)
      .filter(col("doc_id") % plantEvery === 0 &&
        regexp_count(col("text"), lit("\\S+")) >= minTokens)
      .select("doc_id", "text")

  /** Loud id-space guard (fail-loudly doctrine): all tier arithmetic
    * assumes natural ids < PlantOffset — once a scale factor crosses
    * that, planted ids ALIAS real ones and the `% PlantOffset` pair
    * filters silently misclassify pairs, corrupting recall instead of
    * failing. One column-pruned max() scan per contract query is the
    * price of never reporting a corrupted recall number.
    */
  private[graft] def guardIds(d: DataFrame, idCol: String): Unit = {
    val m = d.agg(max(col(idCol))).head()
    if (!m.isNullAt(0))
      require(m.getLong(0) < PlantOffset,
        s"planting id-space collision: max($idCol) = ${m.getLong(0)} >= PlantOffset $PlantOffset — " +
          "raise Dedup.PlantOffset above the corpus id range")
  }

  /** Tier-truncated copies unioned onto `base`; `elig` is the (ideally
    * cached) eligible frame — passed in so contract queries can compute
    * eligibility ONCE instead of once per tier union.
    */
  private[graft] def plantedJaccardFrom(base: DataFrame, elig: DataFrame): DataFrame =
    JaccardTiers.foldLeft(base.select("doc_id", "text")) {
      case (acc, (_, frac, k, _)) =>
        acc.unionByName(elig.select(
          (col("doc_id") + k * PlantOffset).as("doc_id"),
          truncateTokens(col("text"), frac).as("text")))
    }

  /** Corpus + one truncated copy per Jaccard tier at
    * `doc_id + tierMultiple * PlantOffset`.
    */
  def plantedJaccardDocs(spark: SparkSession, sfDir: String,
                         plantEvery: Int = 2, minTokens: Int = 60): DataFrame = {
    val d = docs(spark, sfDir)
    guardIds(d, "doc_id")
    plantedJaccardFrom(d, eligibleDocs(spark, sfDir, plantEvery, minTokens))
  }

  /** Per-tier MinHash recall contract. Output: one row per tier with
    * the oracle-pinned booleans —
    *  planted_ok: the tier planted a non-empty cohort and found ≥ 1 pair;
    *  recall_ok:  realized recall ≥ the tier's pinned minimum;
    *  jaccard_ok: mean verified Jaccard of found pairs within ±0.12 of
    *              the tier target (the planting landed where intended).
    * Verification keeps a found pair only at Jaccard ≥ target - 0.15,
    * so a bucket-collision fluke on an unrelated pair can't count.
    */
  def minhashNearRecall(spark: SparkSession, sfDir: String,
                        plantEvery: Int = 2, minTokens: Int = 60): DataFrame = {
    import spark.implicits._
    val d = docs(spark, sfDir)
    guardIds(d, "doc_id")
    // Eligibility (a full-corpus regexp filter) computed ONCE: cached,
    // counted from the cache, and reused by every tier union — the
    // uncached formulation re-scanned the corpus once per tier plus
    // once for the count.
    val elig = eligibleDocs(spark, sfDir, plantEvery, minTokens).persist()
    try {
      val nPlanted = elig.count()
      val cands = Dedup.minhashCandidatesOf(plantedJaccardFrom(d, elig))
        .filter(col("id_a") < PlantOffset && col("id_b") > col("id_a") &&
          (col("id_b") - col("id_a")) % PlantOffset === 0)
        .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      // one aggregation job: per-tier found count (tier-thresholded) + mean jaccard
      val aggs = JaccardTiers.flatMap { case (name, frac, k, _) =>
        Seq(
          count(when(col("k") === k && col("jaccard") >= frac - 0.15, 1)).as(s"n_$name"),
          avg(when(col("k") === k && col("jaccard") >= frac - 0.15, col("jaccard"))).as(s"j_$name"))
      }
      val r = cands.agg(aggs.head, aggs.tail: _*).collect()(0)
      JaccardTiers.map { case (name, frac, _, minRecall) =>
        val nFound = r.getAs[Long](s"n_$name")
        val meanJ = Option(r.getAs[java.lang.Double](s"j_$name")).map(_.toDouble).getOrElse(0.0)
        val recall = if (nPlanted == 0) 0.0 else nFound.toDouble / nPlanted
        (name, nPlanted > 0 && nFound > 0, recall >= minRecall, math.abs(meanJ - frac) <= 0.12)
      }.toDF("tier", "planted_ok", "recall_ok", "jaccard_ok").orderBy("tier")
    } finally { elig.unpersist(); () }
  }

  // --------------------------------------------------- simhash swap tiers

  /** (tier, replace every m-th token, id-offset multiple, min recall).
    * Scattered single-token swaps flip few fingerprint bits on long
    * docs; candidate generation is structural for hamming ≤ 7
    * (4×16-bit bands + hamming-1 multiprobe) and probabilistic above —
    * measured mean hamming ≈ 7.5 at swap30 and ≈ 9.7 at swap15 (sf0.01,
    * over recovered pairs), so the
    * light tier leans on the structural bound while the heavy tier
    * genuinely exercises the probabilistic band-collision regime (which
    * is why its pin sits lower).
    */
  val SimTiers: Seq[(String, Int, Int, Double)] = Seq(
    ("swap30", 30, 1, 0.80),
    ("swap15", 15, 2, 0.40))

  /** Replace every m-th token with a position-dependent marker. */
  private def swapTokens(text: Column, every: Int): Column = {
    val toks = Dedup.tokens(text)
    concat_ws(" ",
      zip_with(toks, sequence(lit(0), size(toks) - 1),
        (t, i) => when(i % every === 0,
          concat(lit("graftswap"), pmod(i, lit(7)))).otherwise(t)))
  }

  private[graft] def plantedSwapFrom(base: DataFrame, elig: DataFrame): DataFrame =
    SimTiers.foldLeft(base.select("doc_id", "text")) {
      case (acc, (_, every, k, _)) =>
        acc.unionByName(elig.select(
          (col("doc_id") + k * PlantOffset).as("doc_id"),
          swapTokens(col("text"), every).as("text")))
    }

  def plantedSwapDocs(spark: SparkSession, sfDir: String,
                      plantEvery: Int = 2, minTokens: Int = 60): DataFrame = {
    val d = docs(spark, sfDir)
    guardIds(d, "doc_id")
    plantedSwapFrom(d, eligibleDocs(spark, sfDir, plantEvery, minTokens))
  }

  /** Per-tier SimHash recall contract over the swap tiers; found =
    * candidate pair surfaced by the banded+multiprobe join with
    * verified hamming ≤ maxHamming.
    */
  def simhashNearRecall(spark: SparkSession, sfDir: String,
                        plantEvery: Int = 2, minTokens: Int = 60,
                        maxHamming: Int = 12): DataFrame = {
    import spark.implicits._
    val d = docs(spark, sfDir)
    guardIds(d, "doc_id")
    val elig = eligibleDocs(spark, sfDir, plantEvery, minTokens).persist()
    try {
      val nPlanted = elig.count()
      val cands = Dedup.simhashCandidatesOf(plantedSwapFrom(d, elig), shingleN = 2)
        .filter(col("id_a") < PlantOffset && col("id_b") > col("id_a") &&
          (col("id_b") - col("id_a")) % PlantOffset === 0)
        .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      val aggs = SimTiers.map { case (name, _, k, _) =>
        count(when(col("k") === k && col("hamming") <= maxHamming, 1)).as(s"n_$name")
      }
      val r = cands.agg(aggs.head, aggs.tail: _*).collect()(0)
      SimTiers.map { case (name, _, _, minRecall) =>
        val nFound = r.getAs[Long](s"n_$name")
        val recall = if (nPlanted == 0) 0.0 else nFound.toDouble / nPlanted
        (name, nPlanted > 0 && nFound > 0, recall >= minRecall)
      }.toDF("tier", "planted_ok", "recall_ok").orderBy("tier")
    } finally { elig.unpersist(); () }
  }

  // ---------------------------------------------- embedding cosine tiers

  /** (tier, exact planted cosine, id-offset multiple, min recall).
    * Analytic recall at 8 tables × 8 planes (p = 1-θ/π):
    * cos 0.99 → ~0.9999, 0.97 → ~0.997, 0.95 → ~0.988.
    */
  val CosineTiers: Seq[(String, Double, Int, Double)] = Seq(
    ("c99", 0.99, 1, 0.90),
    ("c97", 0.97, 2, 0.90),
    ("c95", 0.95, 3, 0.85))

  /** Deterministic per-id pseudo-noise direction, element i of 64:
    * integer LCG-ish arithmetic only, so any engine reproduces it.
    */
  private def noiseDir(id: Column): Column =
    transform(sequence(lit(0), lit(63)),
      i => (pmod((id * 31 + i) * lit(2654435761L), lit(1009L)).cast("double") / 1009.0) - 0.5)

  /** Rotate `v` by exactly θ = acos(cosT) toward the component of the
    * per-id noise direction orthogonal to v:
    * v' = cosθ·v̂ + sinθ·û⊥ (unit output), so cos(v, v') = cosT exactly
    * — cosine is scale-invariant, so normalizing the output is free.
    * Every step is materialized as a real column BEFORE any lambda
    * references it (HOF lambdas re-evaluate captured expression trees
    * per element).
    */
  def rotatedTo(e: DataFrame, cosT: Double): DataFrame = {
    val sinT = math.sqrt(1.0 - cosT * cosT)
    e.select(col("vec_id"), col("embedding").as("v"), noiseDir(col("vec_id")).as("u"))
      .withColumn("nv2", VectorOps.dot(col("v"), col("v")))
      .withColumn("duv", VectorOps.dot(col("u"), col("v")))
      // w = u - (u·v / v·v) v  — the component of u orthogonal to v
      .select(col("vec_id"), col("v"), col("nv2"),
        zip_with(col("u"), col("v"), (ui, vi) => ui - vi * col("duv") / col("nv2")).as("w"))
      .withColumn("nw", sqrt(VectorOps.dot(col("w"), col("w"))))
      .select(col("vec_id"),
        zip_with(col("v"), col("w"),
          (vi, wi) => (lit(cosT) * vi / sqrt(col("nv2")) + lit(sinT) * wi / col("nw"))
            .cast("float")).as("embedding"))
  }

  /** One-scan graded member fan-out: member `j = 1..members` of each
    * input row is its embedding rotated to cosine exactly
    * `1 - step·j` — the SAME arithmetic as [[rotatedTo]] with the
    * grade as a per-row column (explode), so building a whole graded
    * neighborhood costs one scan instead of `members` union branches
    * (each a separate scan + analysis pass — measured as the dominant
    * cost of the clustered recall corpus at sf1). Bit-identical to the
    * per-tier path: the cosT/sinT arithmetic runs the same IEEE ops on
    * the same doubles, pinned by spec. Output: (vec_id, j, embedding);
    * the caller owns id fan-out (noise direction keys off the ORIGINAL
    * vec_id, exactly like the fold-of-unions did).
    */
  def gradedMembers(centers: DataFrame, members: Int, step: Double = 0.01): DataFrame = {
    val withJ = centers
      .withColumn("j", explode(sequence(lit(1), lit(members))))
    val cosT = lit(1.0) - lit(step) * col("j").cast("double")
    withJ
      .select(col("vec_id"), col("j"), col("embedding").as("v"),
        noiseDir(col("vec_id")).as("u"), cosT.as("cosT"))
      .withColumn("sinT", sqrt(lit(1.0) - col("cosT") * col("cosT")))
      .withColumn("nv2", VectorOps.dot(col("v"), col("v")))
      .withColumn("duv", VectorOps.dot(col("u"), col("v")))
      .select(col("vec_id"), col("j"), col("v"), col("nv2"), col("cosT"), col("sinT"),
        zip_with(col("u"), col("v"), (ui, vi) => ui - vi * col("duv") / col("nv2")).as("w"))
      .withColumn("nw", sqrt(VectorOps.dot(col("w"), col("w"))))
      .select(col("vec_id"), col("j"),
        zip_with(col("v"), col("w"),
          (vi, wi) => (col("cosT") * vi / sqrt(col("nv2")) + col("sinT") * wi / col("nw"))
            .cast("float")).as("embedding"))
  }

  private[graft] def plantedCosineFrom(e: DataFrame, base: DataFrame): DataFrame =
    CosineTiers.foldLeft(e) { case (acc, (_, cosT, k, _)) =>
      acc.unionByName(
        rotatedTo(base, cosT).select(
          (col("vec_id") + k * PlantOffset).as("vec_id"), col("embedding")))
    }

  /** Embedding corpus + one rotated copy per cosine tier. */
  def plantedCosineEmbeddings(spark: SparkSession, sfDir: String,
                              plantEvery: Int = 10): DataFrame = {
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    guardIds(e, "vec_id")
    plantedCosineFrom(e, e.filter(pmod(col("vec_id"), lit(plantEvery)) === 0))
  }

  /** Per-tier embedding-LSH recall contract. cosine_ok pins that the
    * rotation landed the pair at the intended cosine (±0.005 — the
    * construction is exact up to float32 rounding).
    */
  def embeddingNearRecall(spark: SparkSession, sfDir: String,
                          plantEvery: Int = 10): DataFrame = {
    import spark.implicits._
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    guardIds(e, "vec_id")
    val base = e.filter(pmod(col("vec_id"), lit(plantEvery)) === 0).persist()
    try {
      val nPlanted = base.count()
      val cands = Dedup.embeddingCandidatesOf(
          plantedCosineFrom(e, base),
          nTables = 8, planesPerTable = 8)
        .filter(col("id_a") < PlantOffset && col("id_b") > col("id_a") &&
          (col("id_b") - col("id_a")) % PlantOffset === 0)
        .withColumn("k", ((col("id_b") - col("id_a")) / PlantOffset).cast("int"))
      val aggs = CosineTiers.flatMap { case (name, cosT, k, _) =>
        Seq(
          count(when(col("k") === k && col("cosine") >= cosT - 0.02, 1)).as(s"n_$name"),
          avg(when(col("k") === k && col("cosine") >= cosT - 0.02, col("cosine"))).as(s"c_$name"))
      }
      val r = cands.agg(aggs.head, aggs.tail: _*).collect()(0)
      CosineTiers.map { case (name, cosT, _, minRecall) =>
        val nFound = r.getAs[Long](s"n_$name")
        val meanC = Option(r.getAs[java.lang.Double](s"c_$name")).map(_.toDouble).getOrElse(0.0)
        val recall = if (nPlanted == 0) 0.0 else nFound.toDouble / nPlanted
        (name, nPlanted > 0 && nFound > 0, recall >= minRecall, math.abs(meanC - cosT) <= 0.005)
      }.toDF("tier", "planted_ok", "recall_ok", "cosine_ok").orderBy("tier")
    } finally { base.unpersist(); () }
  }

  // ------------------------------------------------- ANN near-probe top-1

  /** Noised-probe top-1 contract for both ANN indexes: probes are
    * corpus vectors rotated to cosine 0.97 (ids offset so the
    * self-exclusion filter can't hide the target), and each index must
    * return the UNROTATED original as top-1 — the nearest natural
    * neighbor sits at cosine ≈ 0.5 on this corpus, so success means the
    * index actually navigated to the right bucket/list, not that the
    * problem was easy. Output: one oracle-pinned boolean per method.
    */
  def annNearTop1(spark: SparkSession, sfDir: String,
                  probeEvery: Int = 50, probeCos: Double = 0.97,
                  minRate: Double = 0.90): DataFrame = {
    import spark.implicits._
    val data = emb(spark, sfDir).select("vec_id", "embedding")
    val base = data.filter(pmod(col("vec_id"), lit(probeEvery)) === 0)
    val probes = rotatedTo(base, probeCos)
      .select((col("vec_id") + PlantOffset).as("probe_id"), col("embedding").as("probe_vec"))
    val nProbes = base.count()
    def top1Rate(top1: DataFrame): Double = {
      val hits = top1.filter(col("neighbor_id") === col("probe_id") - PlantOffset).count()
      if (nProbes == 0) 0.0 else hits.toDouble / nProbes
    }
    // independent index measurements — concurrent jobs (guide §2.6)
    val (lshRate, ivfRate) = graft.util.Par.par2(
      top1Rate(
        graft.similarity.Ann.lshTopKOf(data, probes, k = 1, nTables = 8, planesPerTable = 6)),
      top1Rate(
        graft.similarity.Ivf.ivfTopKOf(data, probes, k = 1, nLists = 16, nProbe = 4)))
    Seq(("ivf", nProbes > 0 && ivfRate >= minRate), ("lsh", nProbes > 0 && lshRate >= minRate))
      .toDF("method", "top1_ok").orderBy("method")
  }
}
