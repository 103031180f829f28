package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Product quantization (PQ) — the third ANN scale path beside
  * [[Ann]]'s LSH and [[Ivf]]: vectors are compressed to `m` one-byte
  * codes (one per subspace) and queries scan the COMPRESSED corpus via
  * asymmetric distance computation (ADC), re-ranking only a small
  * candidate set exactly. At 100 TB this is the memory lever: a
  * 64-dim float vector (256 B) becomes m=8 codes (8 B) — the corpus
  * fits executor memory 32× denser, and the scan reads codes, not
  * vectors. (Classic composition stacks this inside [[Ivf]]'s lists —
  * both stages here are built from the same assignment primitive, so
  * composing is a filter on list_id before the ADC scan.)
  *
  * Scale design mirrors Ivf: codebooks are m×ksub×(dim/m) doubles —
  * driver-local bytes by construction — so sub-vector assignment and
  * the per-probe ADC distance are literal-codebook CODEGEN expressions
  * (no crossJoin against a centroid table, no shuffle, no per-vector
  * window). The ADC scan joins broadcast probes against the codes
  * frame; only (probe, vec, adist) survive to the re-rank window, and
  * exact embeddings are joined back for the top-`rerank` candidates
  * ONLY.
  *
  * Correctness: k-means is data-dependent, so the oracle contract
  * ([[pqRecallAtK]], `ann_pq`) follows the ann_recall_atk pattern —
  * recall@k over [[Ann.clusteredEmbeddings]]' dense planted
  * neighborhoods vs the engine's own (oracle-ranked) brute force,
  * pinned as booleans. Detuning m/ksub/rerank drops recall below the
  * pin and breaks the hash.
  */
object Pq {

  /** Codebooks: `books(s)(code)` = centroid of subspace `s`. */
  type Codebooks = Array[Array[Seq[Double]]]

  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sub-vector `s` (0-based) of a double-array column. */
  private def subSlice(vec: Column, s: Int, sub: Int): Column =
    slice(vec, s * sub + 1, sub)

  /** 0-based nearest-code argmin over a literal codebook — ties to the
    * lowest code, same rule as [[Ivf.nearestIdExpr]]. One referenced-
    * constant codegen node ([[VectorOps.nearestCentroid]]): the
    * unrolled ksub·sub lit() tree this replaces cost ~20 s of
    * analysis + Janino PER TRAINED PIPELINE at sf0.1.
    */
  private[similarity] def nearestCodeExpr(book: Array[Seq[Double]], subv: Column): Column =
    VectorOps.nearestCentroid(Array.range(0, book.length), book.map(_.toArray), subv)

  /** Codebooks as the primitive nested array the ADC expression holds
    * as a referenced constant.
    */
  private def booksArr(books: Codebooks): Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray))

  /** Deterministic per-subspace k-means (joint Lloyd over all
    * subspaces): init = evenly spaced vec_ids' sub-vectors (no RNG);
    * each iteration is ONE corpus scan — the m-way sub-vector explode,
    * literal-codebook assignment and (s, code, dim) partial-avg all
    * happen inside the same stage, and only m·ksub·(dim/m) centroid
    * doubles reach the driver per pass. Codes with no members keep
    * their previous centroid (k-means' standard empty-cluster rule).
    */
  def trainCodebooks(data: DataFrame, m: Int, ksub: Int, iters: Int = 3): Codebooks = {
    val dimRow = data.select(size(col("embedding"))).limit(1).collect().headOption
    require(dimRow.nonEmpty, "empty corpus — no codebook init rows")
    val dim = dimRow.get.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    // Init: ksub deterministic pseudo-random rows via hash-ordered
    // top-k (TakeOrderedAndProject — distributed, no global sort, no
    // reliance on contiguous ids; planted corpora leave id holes).
    val initRows = data
      .select(col("vec_id"), dvec(col("embedding")).as("v"))
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Double](1))
    require(initRows.nonEmpty, "empty corpus — no codebook init rows")
    val seed = Array.tabulate(ksub)(i => initRows(i % initRows.length))
    var books: Codebooks = Array.tabulate(m)(s =>
      seed.map(v => v.slice(s * sub, s * sub + sub)))
    for (_ <- 1 to iters) {
      val parts = data.select(explode(array((0 until m).map { s =>
        val sv = subSlice(dvec(col("embedding")), s, sub)
        struct(lit(s).as("s"), nearestCodeExpr(books(s), sv).as("code"), sv.as("subvec"))
      }: _*)).as("p"))
        .select(col("p.s"), col("p.code"), posexplode(col("p.subvec")).as(Seq("i", "x")))
        .groupBy("s", "code", "i")
        .agg(avg("x").as("c"))
        .groupBy("s", "code")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          e => e.getField("c")).as("cvec"))
        .collect()
      val next = books.map(_.clone())
      parts.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2)
      }
      books = next
    }
    books
  }

  /** Compressed corpus: (vec_id, codes array<int> of length m). */
  def encode(data: DataFrame, books: Codebooks): DataFrame = {
    val sub = books(0)(0).length
    data.select(col("vec_id"),
      array(books.indices.map(s =>
        nearestCodeExpr(books(s), subSlice(dvec(col("embedding")), s, sub))): _*).as("codes"))
  }

  /** ADC squared distance between a probe vector and a codes column —
    * sum over subspaces (ascending) of distSq(probe sub-vector,
    * codebook[code]). One referenced-constant codegen node
    * ([[VectorOps.adcDist]]); accepts the raw float/double probe
    * column, no slice/cast trees.
    */
  private def adcDistExpr(books: Codebooks, probeVec: Column, codes: Column): Column =
    VectorOps.adcDist(booksArr(books), probeVec, codes)

  /** FLAT PQ top-k with exact re-rank: ADC scan of the WHOLE compressed
    * corpus → candidates within the top-`rerank` ADC ranks per probe →
    * exact cosine on candidates only → top-k.
    *
    * This is the ORACLE / re-rank path: probes × corpus ADC work is
    * quadratic under the engine's probe contract (probes scale with the
    * corpus), measured 29× at 10× data. The operator a caller gets by
    * name ([[pqTopKOf]], `ann_pq`) bounds the scan with the IVF coarse
    * quantizer by default; use the flat scan for ground-truth checks or
    * when probes are genuinely O(1).
    */
  def pqTopKFlat(data: DataFrame, probes: DataFrame, k: Int,
                 m: Int = 8, ksub: Int = 16, iters: Int = 3,
                 rerank: Int = 50): DataFrame = {
    val books = trainCodebooks(data, m, ksub, iters)
    val codes = encode(data, books)
    // ADC ties are common — every vector sharing a probe's full m-code
    // tuple has the SAME adist (the probe's own quantization error).
    // rank() keeps WHOLE tie groups, so no tie-break ever decides which
    // tied vector survives to the exact re-rank: an exact duplicate's
    // code tuple is the per-subspace argmin, making its ADC distance the
    // global minimum — rank 1 by construction, layout-independent.
    val wAdc = Window.partitionBy("probe_id").orderBy(col("adist"))
    val candidates = codes
      .join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("adist", adcDistExpr(books, col("probe_vec"), col("codes")))
      .withColumn("rn", rank().over(wAdc))
      .filter(col("rn") <= rerank)
      .select("probe_id", "vec_id")
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), col("vec_id"))
    candidates
      .join(data.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(probes), "probe_id")
      .withColumn("cosine", round(VectorOps.cosine(col("embedding"), col("probe_vec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("probe_id", "rk")
  }

  /** PQ top-k, scan-bounded by default: routes through the IVF coarse
    * quantizer ([[ivfPqTopKOf]]) so the ADC scan reads nProbe/nLists of
    * the compressed corpus instead of all of it. Under the engine's
    * probe contract (probes scale with the corpus) the flat scan is
    * quadratic — 29× at 10× data, vs 2.6× bounded — so the name a user
    * reaches for must be the one that survives scale; [[pqTopKFlat]]
    * remains the oracle/ground-truth path.
    */
  def pqTopKOf(data: DataFrame, probes: DataFrame, k: Int,
               m: Int = 8, ksub: Int = 16, iters: Int = 3,
               rerank: Int = 50, nLists: Int = 16, nProbe: Int = 4): DataFrame =
    ivfPqTopKOf(data, probes, k, nLists, nProbe, m, ksub, iters, rerank)

  /** IVF-PQ composition — the standard billion-scale index: the IVF
    * coarse quantizer restricts the scan to nProbe inverted lists, and
    * within those lists distance is the PQ ADC approximation, re-ranked
    * exactly. Both stages are literal-table codegen expressions; the
    * list filter happens BEFORE any per-probe work, so the scanned
    * fraction is nProbe/nLists of the codes frame — at 100 TB the scan
    * reads a few percent of an already-32×-compressed corpus.
    */
  def ivfPqTopKOf(data: DataFrame, probes: DataFrame, k: Int,
                  nLists: Int = 16, nProbe: Int = 4,
                  m: Int = 8, ksub: Int = 16, iters: Int = 3,
                  rerank: Int = 50): DataFrame = {
    // the coarse quantizer and the codebooks are independent trainings
    // over the same input — their collect-driven Lloyd passes overlap
    // as concurrent jobs (guide §2.6); each training is unchanged
    val (cent, books) = graft.util.Par.par2(
      Ivf.trainCentroids(data, nLists, iters),
      trainCodebooks(data, m, ksub, iters))
    ivfPqQuery(cent, books, data, probes, k, nProbe, rerank)
  }

  /** √n-SCALED IVF-PQ (the classic nLists ∝ √n sizing, implemented and
    * measured rather than scaladoc-promised): nLists = max(16, √n), so
    * a probe's scanned fraction nProbe/nLists SHRINKS as the corpus
    * grows (per-probe candidates ∝ √n, not n — the fixed-nLists gate
    * was the dominant term in the 71× sf1→sf10 slope); both the coarse
    * quantizer AND the PQ codebooks train on a bounded deterministic
    * id-hash sample sized to the centroid count
    * ([[Ivf.trainCentroidsOnSample]] / [[Opq.trainingSample]] — the
    * round-13 sampled-OPQ practice), so training cost is ~constant per
    * centroid while encode/assignment stay the one irreducible linear
    * indexing pass.
    */
  /** Bounded-sample sizes up to this collect to the driver and train
    * in-process (≤ 64k × 64 doubles ≈ 32 MB transient — the Faiss
    * practice; zero Spark jobs inside the Lloyd loops). Larger samples
    * — the 40·√n sizing crosses 65,536 around n ≈ 2.7×10⁶ vectors —
    * keep the distributed trainers, so the 100 TB path never collects
    * anything that grows with the corpus.
    */
  private val LocalTrainMaxRows = 65536L

  def ivfPqTopKScaled(data: DataFrame, probes: DataFrame, k: Int,
                      nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
                      iters: Int = 3, rerank: Int = 50): DataFrame = {
    val n = data.count()
    val nLists = math.max(16, math.round(math.sqrt(n.toDouble)).toInt)
    val trainRows = math.max(20000L, 40L * nLists)
    // ONE sample, built from the already-known count, feeds both
    // trainers — no second corpus count, no duplicate checkpoint
    val sample = graft.similarity.Opq.trainingSampleN(
      data.select("vec_id", "embedding"), n, trainRows)
    val (cent, books) =
      if (math.min(n, trainRows) <= LocalTrainMaxRows) {
        // round-14: the whole training set is bounded and small — ONE
        // collect, both trainers driver-side (identical init/assignment/
        // update rules as the distributed mirrors; ~2·iters collect-jobs
        // of fixed scheduling cost removed)
        val local = graft.similarity.Opq.collectSample(sample)
        val spark = data.sparkSession
        import spark.implicits._
        val c = Ivf.trainCentroidsLocal(local, nLists, iters)
          .map { case (id, v) => (id, v.toSeq) }.toSeq.toDF("list_id", "cvec")
        val b: Codebooks = graft.similarity.Opq
          .trainCodebooksLocal(local.vecs, local.initOrder, m, ksub, iters)
          .map(_.map(_.toSeq))
        (c, b)
      } else graft.util.Par.par2(
        Ivf.trainCentroidsFromSample(sample, nLists, iters),
        trainCodebooks(sample, m, ksub, iters))
    ivfPqQuery(cent, books, data, probes, k, nProbe, rerank)
  }

  /** The QUERY side of IVF-PQ against trained centroids + codebooks
    * (shared by the fixed and √n-scaled builders).
    */
  def ivfPqQuery(cent: DataFrame, books: Codebooks, data: DataFrame,
                 probes: DataFrame, k: Int, nProbe: Int,
                 rerank: Int): DataFrame = {
    // compressed corpus with list assignment: ONE scan computes both
    // the coarse list id and the m sub-codes (all literal-table exprs)
    val centsLocal = cent.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val sub = books(0)(0).length
    val codes = data.select(col("vec_id"),
      Ivf.nearestIdExpr(centsLocal, dvec(col("embedding"))).as("list_id"),
      array(books.indices.map(s =>
        nearestCodeExpr(books(s), subSlice(dvec(col("embedding")), s, sub))): _*).as("codes"))
    val wp = Window.partitionBy("probe_id").orderBy(col("dist"), col("list_id"))
    val probeLists = probes
      .crossJoin(broadcast(cent))
      .withColumn("dist", VectorOps.distSq(dvec(col("probe_vec")), col("cvec")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select("probe_id", "list_id")
    // same tie-group inclusion as pqTopKFlat: rank() keeps every vector
    // tied at the cutoff, so equal-code ties can never evict the true
    // duplicate before the exact re-rank, whatever the id layout
    val wAdc = Window.partitionBy("probe_id").orderBy(col("adist"))
    val candidates = codes
      .join(probeLists.hint("broadcast"), "list_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .join(broadcast(probes), "probe_id")
      .withColumn("adist", adcDistExpr(books, col("probe_vec"), col("codes")))
      .withColumn("rn", rank().over(wAdc))
      .filter(col("rn") <= rerank)
      .select("probe_id", "vec_id")
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), col("vec_id"))
    candidates
      .join(data.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(probes), "probe_id")
      .withColumn("cosine", round(VectorOps.cosine(col("embedding"), col("probe_vec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("probe_id", "rk")
  }

  /** Oracle-verified IVF-PQ query (`ann_ivf_pq`): each probe's exact
    * duplicate is planted; identical vectors share the coarse list AND
    * the full m-code tuple, so the copy's ADC distance equals the
    * probe's own quantization error — the GLOBAL MINIMUM over code
    * tuples (its codes are the per-subspace argmin), hence ADC rank 1.
    * rank()'s tie-group inclusion then guarantees the plant reaches the
    * exact re-rank regardless of id layout, and re-rank returns it
    * top-1 at cosine 1.0.
    */
  def ivfPqPlantedTop1(spark: SparkSession, sfDir: String,
                       probeEvery: Int = 50, offset: Long = 1000000L): DataFrame = {
    val data = Ann.plantedEmbeddings(spark, sfDir, probeEvery, offset)
    val probes = Ann.gateProbes(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), probeEvery)
    // √n lists + sampled training: the planted guarantee is nLists-
    // INVARIANT (identical vectors share the argmin list and the full
    // code tuple under ANY trained centroids/codebooks), so the gate
    // runs the scaled build a production corpus needs — measured 71×
    // at 10× data under fixed nLists, linear after this change.
    ivfPqTopKScaled(data, probes, k = 1)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"))
      .orderBy("probe_id")
  }

  /** recall@k contract over the dense clustered corpus (`ann_pq`):
    * same regime as [[Ann.annRecallAtK]] — every center has 12 graded
    * planted neighbors, ground truth is the engine's own brute force,
    * and the realized PQ recall must clear the pin. One boolean row.
    *
    * Probes are CAPPED ([[Ann.sampleProbes]]): recall is a statistic,
    * and estimating it over a deterministic hash-sample of centers
    * keeps the ground-truth brute force (probes × corpus) linear in
    * the corpus instead of quadratic. Below the cap the sample is all
    * centers, so the small-SF oracle behavior is unchanged.
    */
  def pqRecallAtK(spark: SparkSession, sfDir: String, k: Int = 10,
                  centerEvery: Int = 20, members: Int = 12,
                  minRecall: Double = 0.90, maxProbes: Int = 2000): DataFrame = {
    import spark.implicits._
    val data = Ann.clusteredEmbeddings(spark, sfDir, centerEvery, members).localCheckpoint()
    val probes = Ann.sampleProbes(
      data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(centerEvery)) === 0),
      maxProbes)
      .localCheckpoint()
    val nProbes = probes.count()
    // ground truth and index training are independent until the hits
    // join — concurrent jobs (guide §2.6), computations unchanged
    val (brute, approx) = graft.util.Par.par2(
      Ann.bruteForceTopKOf(data, probes, k)
        .select("probe_id", "neighbor_id").localCheckpoint(),
      pqTopKOf(data, probes, k).select("probe_id", "neighbor_id"))
    val nTruth = brute.count()
    val hits = brute.join(approx, Seq("probe_id", "neighbor_id")).count()
    val recall = if (nTruth == 0) 0.0 else hits.toDouble / nTruth
    Seq(("pq", nProbes > 0, recall >= minRecall))
      .toDF("method", "planted_ok", "recall_ok").orderBy("method")
  }
}
