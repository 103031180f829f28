package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hamming-near-duplicate detection over image perceptual hashes
  * (SURVEY.md §2c): the multimodal counterpart of `dedup_simhash_near`.
  * Equal-phash grouping (`mm_phash`) only catches perceptually
  * IDENTICAL images; re-encoded / slightly-retouched copies land a few
  * bits away, and finding them at corpus scale must not be a pairwise
  * hash comparison.
  *
  * Candidate generation is the banded pigeonhole join: the 64-bit
  * phash splits into 4 disjoint 16-bit bands; two hashes within
  * hamming distance 3 agree EXACTLY on at least one band (3 flips
  * can touch at most 3 of 4 bands), so banding is complete for d ≤ 3 —
  * a structural guarantee, not a probabilistic one. Each image emits 4
  * (band, value) keys; candidates equi-join on the key, then one
  * `bit_count(a XOR b)` verifies the exact distance. Shuffles carry
  * (id, 8-byte hash) only; a loud max-bucket guard (the Semantic
  * cluster-size discipline) fails rather than silently grinding if a
  * degenerate corpus concentrates one band value.
  *
  * Contract: every ok image plants two twins at hash level —
  * +[[Tier1Offset]] with exactly 1 flipped bit, +[[Tier3Offset]] with
  * exactly 3 (flip positions are id arithmetic mod 61, pairwise
  * distinct, below bit 61 so the hash stays non-negative). Banding
  * must surface EVERY twin (complete recall, exact hamming per tier) —
  * a broken band split, xor, or popcount breaks the pinned row.
  */
object PhashNear {

  private val Tier1Offset = 10000000L
  private val Tier3Offset = 20000000L

  /** Exactly-k-bit flip mask from id arithmetic: positions are
    * (id·7) %61 and +17, +34 offsets mod 61 — pairwise distinct
    * because 17 and 34 are non-zero mod 61.
    */
  private def mask(id: org.apache.spark.sql.Column, k: Int) = {
    val p1 = pmod(id * 7, lit(61))
    val bits = Seq(p1, pmod(p1 + 17, lit(61)), pmod(p1 + 34, lit(61))).take(k)
    // functions.shiftleft takes a literal Int shift; the SQL builtin
    // accepts a column — call it by name (2^p would also be exact).
    bits.map(p => call_function("shiftleft", lit(1L), p.cast("int")))
      .reduce(_.bitwiseOR(_))
  }

  def phashNearRecall(spark: SparkSession, sfDir: String,
                      maxBucket: Long = 5000): DataFrame = {
    import spark.implicits._
    val base = Multimodal.phashes(spark, sfDir)
      .filter(col("ok")).select(col("media_id"), col("phash"))
    val nPlanted = base.count()
    val corpus = base
      .unionByName(base.select((col("media_id") + Tier1Offset).as("media_id"),
        col("phash").bitwiseXOR(mask(col("media_id"), 1)).as("phash")))
      .unionByName(base.select((col("media_id") + Tier3Offset).as("media_id"),
        col("phash").bitwiseXOR(mask(col("media_id"), 3)).as("phash")))

    // 4 disjoint 16-bit bands per hash; eager lineage cut so the decode
    // pass runs once for the guard aggregate AND the candidate join.
    val bands = corpus.select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bval"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"), col("bk.band"), col("bk.bval"))
      .localCheckpoint()

    val biggest = bands.groupBy("band", "bval").count()
      .agg(max("count")).collect()(0).getLong(0)
    require(biggest <= maxBucket,
      s"phash band bucket of $biggest exceeds cap $maxBucket — " +
        "degenerate hash concentration; shrink bands or pre-split the bucket")

    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))

    val planted = cands.filter(col("id_a") < Tier1Offset)
      .withColumn("tier",
        when(col("id_b") === col("id_a") + Tier1Offset, "flip1")
          .when(col("id_b") === col("id_a") + Tier3Offset, "flip3"))
      .filter(col("tier").isNotNull)
    val r = planted.agg(
      count(when(col("tier") === "flip1" && col("hamming") === 1, 1)).as("n1"),
      count(when(col("tier") === "flip3" && col("hamming") === 3, 1)).as("n3"))
      .collect()(0)
    Seq(
      ("flip1", nPlanted, r.getLong(0), nPlanted > 0 && r.getLong(0) == nPlanted),
      ("flip3", nPlanted, r.getLong(1), nPlanted > 0 && r.getLong(1) == nPlanted))
      .toDF("tier", "n_planted", "n_found", "recall_ok")
      .orderBy("tier")
  }
}
