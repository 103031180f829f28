package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OPQ-style rotation ahead of product quantization.
  *
  * Plain PQ quantizes axis-aligned sub-spaces independently, so when
  * the data's variance is CONCENTRATED in few sub-spaces (correlated
  * dimensions — the common case for learned embeddings after any
  * whitening-free training), one sub-quantizer carries all the signal
  * with only ksub cells while the rest spend their bits on noise. The
  * standard fix (OPQ, Ge et al., CVPR 2013) rotates the space by an
  * orthogonal matrix before the sub-space split so every sub-quantizer
  * sees a balanced share of the variance. Full OPQ alternates R and
  * codebook optimization; the fixed-rotation variant used here (a
  * deterministic seeded orthogonal matrix — the "OPQ-RR"/random-
  * rotation baseline of the same paper) already repairs the
  * concentrated-variance failure and keeps everything reproducible:
  * no RNG state, no data-dependent training for R.
  *
  * Scale shape: the rotation is a LITERAL-matrix mat-vec — one codegen
  * projection per row (dim² literal multiply-adds), no join, no
  * shuffle, composed in front of the unchanged [[Pq]] machinery.
  * Cosine ranking is invariant under orthogonal maps, so the exact
  * re-rank stage needs no un-rotation.
  *
  * Contract (`ann_opq`): [[concentratedEmbeddings]] builds a corpus
  * whose discriminative signal lives ENTIRELY in sub-space 0 (the
  * first dim/m dimensions) with planted graded neighbor groups, dense
  * enough that plain PQ's ADC candidate window drowns in same-cell
  * ties and recall@10 collapses, while the SAME pipeline behind the
  * rotation clears a high pin. Both recalls are measured against the
  * engine's own brute force and pinned as booleans — PQ's failure is
  * part of the oracle, not an anecdote.
  */
object Opq {

  /** Id base for the synthetic concentrated corpus (disjoint from every
    * other planted id space).
    */
  val OpqOffset: Long = 200000000L

  /** Deterministic orthogonal matrix: a product of `dim` Householder
    * reflections with LCG-seeded directions (same constants as
    * [[Ann.hyperplanes]]). Each reflection is exactly orthogonal, so
    * the product is too (up to IEEE rounding — verified to 1e-12 in
    * the spec); `dim` reflections mix every input direction across
    * every output sub-space, which rank-deficient few-reflection
    * products would not.
    */
  def rotationMatrix(dim: Int, seed: Long = 4242L): Array[Array[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    var m = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until dim) {
      val v = Array.fill(dim)(next())
      val n = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / n)
      // m <- (I - 2uuᵀ)·m ; row update via the shared uᵀm products
      val utm = Array.tabulate(dim)(j => (0 until dim).map(k => u(k) * m(k)(j)).sum)
      m = Array.tabulate(dim, dim)((i, j) => m(i)(j) - 2.0 * u(i) * utm(j))
    }
    m
  }

  /** Literal-matrix mat-vec: `out[j] = Σ_k R[j][k]·v[k]` — ONE codegen
    * expression node with the matrix as a referenced constant
    * ([[graft.functions.VectorExpressions MatVecLitExpr]]). The first
    * cut unrolled dim² `lit()` multiply-adds; semantically identical,
    * but Catalyst analysis + Janino compilation of that 4096-term tree
    * added ~25 s PER PLANNED PIPELINE at dim 64 (measured via
    * OpqProbe) — planning cost, not execution cost, which no cluster
    * size would amortize per-query.
    */
  def rotateExpr(r: Array[Array[Double]], v: Column): Column =
    graft.functions.VectorOps.matVec(r, v)

  /** Corpus with a rotated copy of the embedding column (float or
    * double input; double out).
    */
  def rotated(data: DataFrame, r: Array[Array[Double]]): DataFrame =
    data.select(col("vec_id"), rotateExpr(r, col("embedding")).as("embedding"))

  /** ±1-ish deterministic pseudo-random from a long column: value in
    * [-1, 1] with 1e-3 resolution, pure integer hash + divide.
    */
  private def r01(x: Column): Column =
    (pmod(xxhash64(x), lit(2001L)).cast("double") - 1000.0) / 1000.0

  /** The correlated-sub-space corpus: per seed id (every 40th vec_id,
    * capped at 8000 so the contract costs the same at every SF), 16
    * groups × 13 members. Member r of group g is
    *   signal dims j<8 :  10·rand(g,j) + 0.05·r·rand(g,r,j)
    *   noise  dims j≥8 :  0.05·rand(id,j)
    * — ALL discriminative structure in sub-space 0. With ~12+ groups
    * per ksub=16 cell, a plain-PQ ADC scan sees hundreds of rows whose
    * approximate distance ties at the probe's own quantization error,
    * so the rerank window (50) cannot hold a group's 12 true members;
    * rotated, the signal spreads over all m sub-spaces and group codes
    * separate. Ids live at OpqOffset + dense arithmetic positions.
    */
  def concentratedEmbeddings(spark: SparkSession, sfDir: String,
                             dim: Int = 64, sub: Int = 8): DataFrame = {
    val seeds = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"))
      .filter(pmod(col("vec_id"), lit(40)) === 0 && col("vec_id") < 8000)
    // group index, dense; seed/40 is exact (seeds are multiples of 40)
    val g = (col("seed") / 40 * 16 + col("f")).cast("long")
    val rows = seeds.select(col("vec_id").as("seed"))
      .withColumn("f", explode(sequence(lit(0), lit(15))))
      .withColumn("r", explode(sequence(lit(0), lit(12))))
      .withColumn("g", g)
      .withColumn("vec_id", lit(OpqOffset) + col("g") * 13 + col("r"))
    val signal = (0 until sub).map { j =>
      lit(10.0) * r01(col("g") * 64 + j) +
        lit(0.05) * col("r").cast("double") * r01(col("g") * 6400 + col("r") * 64 + j)
    }
    val noise = (sub until dim).map(j => lit(0.05) * r01(col("vec_id") * 64 + j))
    rows.select(col("vec_id"), col("g"), col("r"),
      array((signal ++ noise): _*).as("embedding"))
  }

  /** Shared recall@k measurement: fraction of the brute-force top-k
    * pairs an index reproduces.
    */
  private def recallOf(brute: DataFrame, approx: DataFrame): Double = {
    val nTruth = brute.count()
    if (nTruth == 0) 0.0
    else brute.join(approx, Seq("probe_id", "neighbor_id")).count().toDouble / nTruth
  }

  /** `ann_opq`: recall@10 of plain PQ vs rotated PQ over the
    * concentrated corpus, both against the engine's own brute force.
    * Plain PQ must FAIL (recall ≤ 0.60 — the corpus genuinely defeats
    * axis-aligned sub-quantizers) and rotated PQ must clear 0.90; both
    * booleans are the oracle.
    */
  def opqRecallContrast(spark: SparkSession, sfDir: String, k: Int = 10,
                        maxPlainRecall: Double = 0.60,
                        minOpqRecall: Double = 0.90): DataFrame = {
    import spark.implicits._
    val corpus = concentratedEmbeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint()
    // probe = the r=0 center of the f=0 group of each seed
    val probes = corpus
      .filter(pmod(col("vec_id") - OpqOffset, lit(16L * 13L)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    val nProbes = probes.count()
    val brute = Ann.bruteForceTopKOf(corpus, probes, k)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val plain = recallOf(brute,
      Pq.pqTopKOf(corpus, probes, k).select("probe_id", "neighbor_id"))
    val rot = rotationMatrix(64)
    val rotCorpus = rotated(corpus, rot).localCheckpoint()
    val rotProbes = rotated(
      probes.select(col("probe_id").as("vec_id"), col("probe_vec").as("embedding")), rot)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    // cosine is rotation-invariant, so the rotated brute-force truth is
    // the same pair set — reuse `brute` rather than recompute it
    val opq = recallOf(brute,
      Pq.pqTopKOf(rotCorpus, rotProbes, k).select("probe_id", "neighbor_id"))
    Seq(
      ("opq", nProbes > 0, opq >= minOpqRecall),
      ("pq_plain", nProbes > 0, plain <= maxPlainRecall))
      .toDF("method", "planted_ok", "contract_ok").orderBy("method")
  }

  /** `ann_opq_ivf`: the rotation composed with the FULL billion-scale
    * index shape — IVF coarse filter + PQ codes + exact re-rank
    * ([[Pq.ivfPqTopKOf]]) — on the same concentrated corpus. The IVF
    * stage quantizes WHOLE vectors, so the coarse filter survives
    * concentrated variance; the PQ codes inside the lists do not, and
    * plain IVF-PQ recall@10 collapses (measured 0.52) while the
    * rotated pipeline holds 1.0. Same boolean-pin oracle discipline as
    * [[opqRecallContrast]]; cosine's rotation invariance again lets
    * both sides share one brute-force truth.
    */
  def opqIvfRecallContrast(spark: SparkSession, sfDir: String, k: Int = 10,
                           maxPlainRecall: Double = 0.60,
                           minOpqRecall: Double = 0.90): DataFrame = {
    import spark.implicits._
    val corpus = concentratedEmbeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint()
    val probes = corpus
      .filter(pmod(col("vec_id") - OpqOffset, lit(16L * 13L)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    val nProbes = probes.count()
    val brute = Ann.bruteForceTopKOf(corpus, probes, k)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val plain = recallOf(brute,
      Pq.ivfPqTopKOf(corpus, probes, k).select("probe_id", "neighbor_id"))
    val rot = rotationMatrix(64)
    val rotCorpus = rotated(corpus, rot).localCheckpoint()
    val rotProbes = rotated(
      probes.select(col("probe_id").as("vec_id"), col("probe_vec").as("embedding")), rot)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    val opq = recallOf(brute,
      Pq.ivfPqTopKOf(rotCorpus, rotProbes, k).select("probe_id", "neighbor_id"))
    Seq(
      ("opq_ivfpq", nProbes > 0, opq >= minOpqRecall),
      ("plain_ivfpq", nProbes > 0, plain <= maxPlainRecall))
      .toDF("method", "planted_ok", "contract_ok").orderBy("method")
  }
}
