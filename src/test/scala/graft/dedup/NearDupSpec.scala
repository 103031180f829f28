package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Graded near-duplicate recall contracts (NearDup): every tier boolean
  * must hold at sf0.001 (the oracle pins the same booleans at sf0.01),
  * and the contract must have TEETH — a detuned knob must flip a tier
  * below its pin, or the pin guards nothing.
  */
class NearDupSpec extends SparkSpec {

  test("minhash truncation tiers: all booleans true at sf0.001") {
    val rows = NearDup.minhashNearRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("j55", "j70", "j85"))
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"tier ${r.getString(0)} failed its contract: $r")
    }
  }

  test("simhash swap tiers: all booleans true at sf0.001") {
    val rows = NearDup.simhashNearRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("swap15", "swap30"))
    rows.foreach(r => assert(r.getBoolean(1) && r.getBoolean(2),
      s"tier ${r.getString(0)} failed its contract: $r"))
  }

  test("embedding rotation tiers: all booleans true, cosine lands exactly") {
    val rows = NearDup.embeddingNearRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("c95", "c97", "c99"))
    rows.foreach(r => assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
      s"tier ${r.getString(0)} failed its contract: $r"))
  }

  test("ANN noised-probe top-1: both indexes recover the original") {
    val rows = NearDup.annNearTop1(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "lsh"))
    rows.foreach(r => assert(r.getBoolean(1), s"${r.getString(0)} missed its top-1 contract"))
  }

  test("rotation construction: planted cosine is exact to float precision") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").limit(20)
    val rot = NearDup.rotatedTo(e, 0.97)
      .select(col("vec_id"), col("embedding").as("rot"))
    val cos = e.join(rot, "vec_id")
      .select(graft.functions.VectorOps.cosine(col("embedding"), col("rot")).as("c"))
      .collect().map(_.getDouble(0))
    assert(cos.length == 20)
    cos.foreach(c => assert(math.abs(c - 0.97) < 1e-4, s"rotation missed target cosine: $c"))
  }

  test("contract has teeth: detuned banding drops the j55 tier below its pin") {
    // With 4 bands instead of 16, analytic recall at J=0.55 falls from
    // ~0.79 to ~0.32 — far below the 0.50 pin. If this ever PASSES the
    // pin, the contract has stopped measuring anything.
    val planted = NearDup.plantedJaccardDocs(spark, sf0001)
    val nElig = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 2 === 0 &&
        regexp_count(col("text"), lit("\\S+")) >= 60)
      .count()
    val found = Dedup.minhashCandidatesOf(planted, bands = 4, rowsPerBand = 4)
      .filter(col("id_a") < Dedup.PlantOffset &&
        (col("id_b") - col("id_a")) === 3 * Dedup.PlantOffset &&
        col("jaccard") >= 0.40)
      .count()
    val recall = found.toDouble / nElig
    assert(recall < 0.50,
      s"detuned 4-band LSH still hit j55 recall $recall — the pin has no teeth")
  }
}
