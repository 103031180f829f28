package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hamming-near-duplicate detection over image perceptual hashes
  * (SURVEY.md §2c): the multimodal counterpart of `dedup_simhash_near`.
  * Equal-phash grouping (`mm_phash`) only catches perceptually
  * IDENTICAL images; re-encoded / slightly-retouched copies land a few
  * bits away, and finding them at corpus scale must not be a pairwise
  * hash comparison.
  *
  * Two structural decisions, both forced by measured sf1 skew:
  *
  *   1. The join runs over DISTINCT hashes, not image rows. Perceptual
  *      hashes are heavily duplicated (every exact-dup group shares one
  *      value; 4-pixel images have only 16 possible hashes), so rows
  *      collapse to hash GROUPS first — the exact-dedup groupBy — and
  *      near-dup relations lift to group pairs. A row-level band join
  *      hit a 99k-row bucket at sf1.
  *   2. Bands are sized to the OCCUPIED bit range per image-SIZE class.
  *      An aHash of n pixels lives in bits 0..n−1; banding all hashes
  *      over a fixed 64-bit layout parks every small-image hash in the
  *      all-zero high bands — one degenerate bucket again. Hamming
  *      comparisons across different rasters sizes are meaningless for
  *      aHash anyway, so the corpus shards by `npx` (from the decoded
  *      header) and each class bands its n bits into 4 spans of
  *      ceil(n/4) — band values spread over the bits the class
  *      actually uses.
  *
  * Within a class, two hashes within hamming distance 3 agree EXACTLY
  * on at least one of the 4 bands (3 flips touch ≤ 3 bands) — banding
  * is complete for d ≤ 3 structurally. One `bit_count(a XOR b)`
  * verifies each candidate; a loud max-bucket guard bounds
  * distinct-hash concentration per (class, band, value).
  *
  * Contract: every ok image plants two twins at hash level —
  * +10M with exactly 1 flipped bit, +20M with exactly 3 (positions are
  * id arithmetic mod the image's OWN npx, pairwise distinct — twins
  * stay valid same-size images). Each image's expected
  * (hash, twin-hash) group pair must surface at its exact distance —
  * complete recall, spec- and oracle-pinned.
  */
object PhashNear {

  private val Tier1Offset = 10000000L
  private val Tier3Offset = 20000000L

  /** Exactly-k-bit flip mask inside the image's own npx bits:
    * positions (id·7) % npx and the next two cyclic positions —
    * pairwise distinct for npx ≥ 3 (this corpus: npx ≥ 4).
    */
  private def mask(id: Column, npx: Column, k: Int) = {
    val p1 = pmod(id * 7, npx)
    val bits = Seq(p1, pmod(p1 + 1, npx), pmod(p1 + 2, npx)).take(k)
    // functions.shiftleft takes a literal Int shift; the SQL builtin
    // accepts a column — call it by name.
    bits.map(p => call_function("shiftleft", lit(1L), p.cast("int")))
      .reduce(_.bitwiseOR(_))
  }

  def phashNearRecall(spark: SparkSession, sfDir: String,
                      maxBucket: Long = 5000): DataFrame = {
    import spark.implicits._
    val base = Multimodal.phashes(spark, sfDir)
      .filter(col("ok"))
      .select(col("media_id"), col("phash"), col("npx"))
      .localCheckpoint()
    val nPlanted = base.count()

    // per-image expected twin hashes (the planted relations)
    val expected = base.select(col("media_id"), col("npx"), col("phash"),
      col("phash").bitwiseXOR(mask(col("media_id"), col("npx"), 1)).as("h1"),
      col("phash").bitwiseXOR(mask(col("media_id"), col("npx"), 3)).as("h3"))

    // distinct hash GROUPS per size class (originals + both twin tiers)
    val hg = base.select(col("npx"), col("phash"))
      .unionByName(expected.select(col("npx"), col("h1").as("phash")))
      .unionByName(expected.select(col("npx"), col("h3").as("phash")))
      .distinct()
      .localCheckpoint()

    // 4 bands of ceil(npx/4) bits covering exactly the occupied range
    // (variable shifts go through the SQL builtins, which accept
    // column shift amounts; the functions API only takes Int literals)
    val width = floor((col("npx") + 3) / lit(4)).cast("int")
    def bandVal(b: Int): Column =
      call_function("shiftrightunsigned", col("phash"), (lit(b) * width).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L), width) - 1)
    val bands = hg
      .select(col("npx"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), bandVal(b).as("bval"))): _*)).as("bk"))
      .select(col("npx"), col("phash"), col("bk.band"), col("bk.bval"))

    val biggestRow = bands.groupBy("npx", "band", "bval").count()
      .agg(max("count")).collect()(0)
    require(!biggestRow.isNullAt(0),
      s"mm_phash_near: no decodable images at $sfDir — nothing to band")
    val biggest = biggestRow.getLong(0)
    require(biggest <= maxBucket,
      s"phash band bucket of $biggest DISTINCT hashes exceeds cap $maxBucket — " +
        "degenerate hash-space concentration; shrink bands or pre-split the bucket")

    // group-pair candidates within a size class (pa < pb canonical)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.npx") === col("b.npx") && col("a.band") === col("b.band") &&
          col("a.bval") === col("b.bval") && col("a.phash") < col("b.phash"))
      .select(col("a.npx").as("npx"), col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))))
      .filter(col("hamming") <= 3)
      .localCheckpoint()

    def foundCount(twinHash: String, d: Int) = {
      val exp = expected.select(col("npx"),
        least(col("phash"), col(twinHash)).as("pa"),
        greatest(col("phash"), col(twinHash)).as("pb"))
      exp.join(cands.filter(col("hamming") === d), Seq("npx", "pa", "pb"), "left_semi")
        .count()
    }
    val (n1, n3) = (foundCount("h1", 1), foundCount("h3", 3))
    Seq(
      ("flip1", nPlanted, n1, nPlanted > 0 && n1 == nPlanted),
      ("flip3", nPlanted, n3, nPlanted > 0 && n3 == nPlanted))
      .toDF("tier", "n_planted", "n_found", "recall_ok")
      .orderBy("tier")
  }
}
