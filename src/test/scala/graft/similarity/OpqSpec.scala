package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {

  test("rotation matrix is orthogonal and deterministic") {
    val r = Opq.rotationMatrix(64)
    // R·Rᵀ = I to tight IEEE tolerance
    for (i <- 0 until 64; j <- 0 until 64) {
      val dot = (0 until 64).map(k => r(i)(k) * r(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-12, s"R·Rᵀ[$i][$j] = $dot")
    }
    // same seed, same matrix (no hidden RNG state)
    val r2 = Opq.rotationMatrix(64)
    assert(r.flatten.toSeq == r2.flatten.toSeq)
    // a genuine mix, not a near-identity: off-diagonal mass everywhere
    val offDiag = (0 until 64).map(i => (0 until 64)
      .filter(_ != i).map(j => math.abs(r(i)(j))).max).min
    assert(offDiag > 0.01, s"every row must mix other dimensions, min-max=$offDiag")
  }

  test("rotateExpr preserves norms and pairwise cosine (orthogonal map)") {
    val r = Opq.rotationMatrix(64)
    val corpus = Opq.concentratedEmbeddings(spark, sf0001).limit(50)
    val before = corpus
      .select(col("vec_id"), graft.functions.VectorOps
        .dot(col("embedding"), col("embedding")).as("n2"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val after = Opq.rotated(corpus, r)
      .select(col("vec_id"), graft.functions.VectorOps
        .dot(col("embedding"), col("embedding")).as("n2"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    before.foreach { case (id, n2) =>
      assert(math.abs(after(id) - n2) < 1e-9 * (1.0 + n2), s"norm changed for $id")
    }
  }

  test("concentrated corpus: signal lives in sub-space 0 only") {
    val c = Opq.concentratedEmbeddings(spark, sf0001)
    val stats = c.select(
      (0 until 8).map(j => abs(element_at(col("embedding"), j + 1))).reduce(greatest(_, _)).as("sig"),
      (8 until 64).map(j => abs(element_at(col("embedding"), j + 1))).reduce(greatest(_, _)).as("noi"))
      .agg(min("sig").as("min_sig_ceiling"), max("noi").as("max_noise")).head()
    assert(stats.getDouble(1) <= 0.05, s"noise dims must stay tiny: $stats")
  }

  test("recall contrast: plain PQ fails the concentrated corpus, OPQ repairs it") {
    val rows = Opq.opqRecallContrast(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(rows("opq") == ((true, true)), s"opq must clear the pin: $rows")
    assert(rows("pq_plain") == ((true, true)),
      s"plain PQ must genuinely fail (recall <= 0.60): $rows")
  }

  test("trained rotation is orthogonal and parametric init is orthonormal") {
    val corpus = Opq.blockStructuredEmbeddings(spark, sf0001)
      .select("vec_id", "embedding").localCheckpoint()
    val pca = Opq.parametricInit(corpus)
    val (trained, _) = Opq.trainRotation(corpus, opqIters = 2, pqIters = 1, init = Some(pca))
    for (r <- Seq(pca, trained); i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"rows $i,$j not orthonormal: $dot")
    }
  }

  test("trained-OPQ distortion contrast holds on the block-structured corpus") {
    // The pins ARE the contract (see opqTrainedContrast's doc): a blind
    // rotation cannot align sub-quantizers with the mixed latent blocks,
    // the trained alternation beats it decisively, and lands within a
    // bounded factor of the aligned (generative-inverse) reference.
    val rows = Opq.opqTrainedContrast(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows == Map(
      "fixed_insufficient" -> true,
      "trained_beats_fixed" -> true,
      "trained_near_aligned" -> true), s"contrast pins violated: $rows")
  }
}
