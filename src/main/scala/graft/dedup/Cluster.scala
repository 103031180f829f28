package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate SURVIVOR selection: verified candidate pairs →
  * connected components → one keeper per cluster + a drop manifest.
  *
  * The near-dup pipelines (minhash/simhash/embedding LSH) emit verified
  * PAIRS; an actual dedup run must turn those pairs into clusters and
  * keep exactly one document per cluster. Pair relations are not
  * transitive (A~B and B~C does not imply the A–C pair was emitted), so
  * this is a connected-components problem, not a groupBy.
  *
  * Scale shape: min-label propagation with POINTER JUMPING
  * (label ← label(label) each round), so convergence is
  * O(log diameter) rounds rather than O(diameter). Each round shuffles
  * only (id, label) pairs — never document payloads — and the pair set
  * itself is the (small) output of LSH candidate verification, orders
  * of magnitude below corpus size. Lineage is cut every round
  * (localCheckpoint) so the plan does not grow with iterations; on a
  * real cluster point `spark.sparkContext.setCheckpointDir` at shared
  * storage and switch to reliable checkpoints if executor loss matters
  * mid-job. Iterations are CAPPED and the cap is a loud failure, never
  * a silently-partial clustering.
  */
object Cluster {

  import Dedup.PlantOffset

  /** Connected components over an undirected pair set `(id_a, id_b)`.
    * Output: one row per id that appears in any pair, with `component`
    * = the MINIMUM id in its connected component (so the component
    * label doubles as the deterministic keeper id).
    *
    * Algorithm: every node starts labeled with itself; each round takes
    * the min of its own and its neighbors' labels, then jumps
    * `label ← label(label)`. Labels only ever decrease, so
    * `sum(label)` is strictly monotone and convergence is detected by
    * an unchanged sum — one aggregate per round instead of a
    * change-count self-join (the sum is exact: DECIMAL(38,0), not a
    * lossy double).
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 15): DataFrame = {
    // both orientations via ONE explode — a union of two projections
    // would reference (and partially recompute) the upstream pair
    // pipeline twice
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .distinct()
      .persist()
    // Convergence detection rides ON each round's checkpoint job via
    // `observe` (the q_hierarchy pattern): the label sum is a metric of
    // the SAME job that materializes the round, so each round is ONE
    // job instead of checkpoint-then-aggregate's two (round-14: the
    // separate labelSum job per round was pure fixed overhead — the
    // checkpoint already scans every row it would re-scan).
    def checkpointSumming(df: DataFrame, name: String): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation(name)
      val out = df
        .observe(obs, sum(col("label").cast("decimal(38,0)")).as("labelsum"))
        .localCheckpoint()
      (out, obs.get("labelsum").asInstanceOf[java.math.BigDecimal])
    }
    // seeded with min(self, min neighbor): the groupBy that would merely
    // enumerate distinct ids performs the first propagation round for
    // free (an isolated pair converges immediately)
    var (labels, prevSum) = checkpointSumming(
      edges.groupBy(col("src").as("id"))
        .agg(min("dst").as("mindst"))
        .select(col("id"), least(col("id"), col("mindst")).as("label")),
      "cc_init")
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("label").as("nlabel"))
      val stepped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // Pointer jump: follow the label one hop (labels are node ids, so
      // label(label) is defined) — halves remaining path lengths.
      val (jumped, s) = checkpointSumming(
        stepped.as("a")
          .join(stepped.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
            col("a.label") === col("b.lid"), "left")
          .select(col("a.id"), coalesce(col("b.llabel"), col("a.label")).as("label")),
        s"cc_round_$it")
      // null sums (an empty pair set) converge immediately — the labels
      // frame is empty and every doc becomes its own singleton cluster
      converged = (s == null && prevSum == null) ||
        (s != null && prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      labels = jumped
      it += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge within $maxIters iterations — " +
        "component diameter exceeds the cap; raise maxIters (log2(diameter) rounds needed)")
    labels.withColumnRenamed("label", "component")
  }

  // ------------------------------------------------- planted chain corpus

  /** Chain tiers: (kept token fraction, id-offset multiple). Truncation
    * is a token PREFIX, so the tier texts nest: tokens(c) ⊂ tokens(b) ⊂
    * tokens(a), giving word-3-gram Jaccard J(a,b) ≈ 0.90,
    * J(b,c) ≈ 0.81/0.90 = 0.90, J(a,c) ≈ 0.81. With the pair threshold
    * at 0.85, ONLY a–b and b–c are verified pairs — the 3-member
    * cluster {a, b, c} exists solely through transitive closure, which
    * is exactly what this operator must get right.
    */
  private[graft] val ChainTiers: Seq[(Double, Int)] = Seq((0.90, 1), (0.81, 2))

  /** Replace every `every`-th token with a marker UNIQUE to (doc, position).
    *
    * Why the harness salts: the synthetic corpus draws from a tiny
    * vocabulary and contains genuine natural near-dups (e.g. two docs
    * sharing a long prefix at word-3-gram Jaccard ≥ 0.85). Those are
    * fine for the PAIR pipelines (their oracles filter to planted ids),
    * but a survivor manifest is a closure over ALL pairs — one natural
    * edge rewires a cluster and the pure-arithmetic oracle breaks.
    * Salting kills ~3 shingles per marker on BOTH sides of any
    * cross-doc pair (capping natural Jaccard ≈ 0.55 even for identical
    * raw texts) while chain copies INHERIT their base's salt, so the
    * planted edge Jaccards are untouched. Token count is unchanged, so
    * eligibility stays a raw-text predicate the oracle can replicate.
    * The operator under test never sees the salt rule — it clusters
    * whatever verified pairs exist.
    */
  private def saltTokens(text: Column, id: Column, every: Int): Column = {
    val toks = Dedup.tokens(text)
    concat_ws(" ",
      zip_with(toks, sequence(lit(0), size(toks) - 1),
        (t, i) => when(i % every === 0,
          concat(lit("graftuniq"), id, lit("x"), i)).otherwise(t)))
  }

  /** Salted corpus + a 2-link chain per eligible doc: `a+k·PlantOffset`
    * holds the first `frac` tokens of salted `a` for each chain tier.
    */
  private[graft] def chainDocs(base: DataFrame, elig: DataFrame): DataFrame = {
    val salted = base.select(col("doc_id"),
      saltTokens(col("text"), col("doc_id"), 10).as("text"))
    val saltedElig = elig.select(col("doc_id"),
      saltTokens(col("text"), col("doc_id"), 10).as("text"))
    ChainTiers.foldLeft(salted) {
      case (acc, (frac, k)) =>
        acc.unionByName(saltedElig.select(
          (col("doc_id") + k * PlantOffset).as("doc_id"),
          NearDup.truncateTokens(col("text"), frac).as("text")))
    }
  }

  /** End-to-end near-dup SURVIVOR manifest over the planted-chain
    * corpus: minhash-LSH candidates → Jaccard-verified pairs →
    * connected components → `(doc_id, cluster_id, keep)` for EVERY doc
    * (singletons are their own cluster). Keeper = min doc_id in the
    * cluster; everything else in the cluster is dropped.
    *
    * Oracle: the chain construction makes the expected closure pure id
    * arithmetic — each eligible doc a yields cluster {a, a+1M, a+2M}
    * rooted at a; every other doc is a singleton. A clustering that
    * stops at one hop (c labeled b instead of a), merges across chains,
    * or misses an LSH edge produces a different manifest = hash break.
    */
  def nearDupSurvivors(spark: SparkSession, sfDir: String,
                       plantEvery: Int = 2, minTokens: Int = 60,
                       threshold: Double = 0.85): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    NearDup.guardIds(d, "doc_id")
    // eager localCheckpoint, not persist+finally-unpersist: the result
    // is LAZY, so an unpersist on exit would fire before the manifest
    // ever executes; checkpoint blocks live as long as the plan does
    // and the ContextCleaner reclaims them after.
    val elig = NearDup.eligibleDocs(spark, sfDir, plantEvery, minTokens).localCheckpoint()
    // checkpoint the salted chain corpus: downstream it is scanned three
    // times (minhash signatures, shingle verification, the final id
    // census) and each scan would otherwise re-read the parquet AND
    // re-run the per-token salting zip_with — pay the union+salt once,
    // read materialized rows after (guide §5: reuse × recompute cost)
    val corpus = chainDocs(d, elig).localCheckpoint()
    val pairs = Dedup.minhashCandidatesOf(corpus)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b")
    val comps = connectedComponents(pairs)
    corpus.select("doc_id")
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Portable bucket hash: Knuth-multiplicative steps with shift-xor
    * finalizers, in pure positive BIGINT arithmetic (products < 2^63,
    * divisors are powers of two so the double division is exact), so
    * DuckDB computes bit-identical splits. The finalizers are
    * LOAD-BEARING: a bare multiply-mod is linear, and linear maps are
    * translation-covariant — the planted chains live at id, id+1M,
    * id+2M, so all chains would shift buckets by the SAME constant and
    * the doc-level-leak counterfactual silently degenerates (observed:
    * zero straddles at sf0.001 under the bare multiplier).
    */
  private def splitOf(id: Column): Column = {
    val b1 = (id * lit(2654435761L)) % lit(4294967296L)
    val s1 = b1.bitwiseXOR((b1 / lit(65536L)).cast("long"))
    val b2 = (s1 * lit(1540483477L)) % lit(4294967296L)
    val s2 = b2.bitwiseXOR((b2 / lit(8192L)).cast("long"))
    when(s2 % lit(10) < 9, lit("train")).otherwise(lit("holdout"))
  }

  /** Leakage-proof train/holdout split (SURVEY.md §2c): assign splits
    * at the NEAR-DUP-CLUSTER level, not the document level, so no two
    * near-duplicates ever straddle train and holdout — the
    * training-data split discipline that decontamination alone cannot
    * give (a doc-level hash split puts ~27% of 3-doc clusters on both
    * sides; `leak_clusters` quantifies exactly that counterfactual
    * per split, and the planted chains guarantee it is non-zero).
    *
    * Scale shape: the expensive step is the already-scale-audited
    * clustering ([[nearDupSurvivors]]); the split itself is pure
    * arithmetic on the cluster label — no extra join, any reader can
    * recompute a doc's split from its manifest row at scan time. The
    * census is a two-level aggregation whose shuffles carry only
    * (cluster_id, split) ids.
    */
  def leakproofSplit(spark: SparkSession, sfDir: String): DataFrame = {
    nearDupSurvivors(spark, sfDir)
      .withColumn("split", splitOf(col("cluster_id")))
      .withColumn("doc_split", splitOf(col("doc_id")))
      .groupBy("cluster_id", "split")
      .agg(count(lit(1)).as("n_docs_c"),
        countDistinct("doc_split").as("n_doc_splits"))
      .groupBy("split")
      .agg(sum("n_docs_c").as("n_docs"),
        count(lit(1)).as("n_clusters"),
        count(when(col("n_doc_splits") > 1, 1)).as("leak_clusters"))
      .orderBy("split")
  }
}
