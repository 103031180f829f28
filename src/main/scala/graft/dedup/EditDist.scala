package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (SURVEY.md §2c): the SEQUENCE-based
  * near-dup family member — MinHash/SimHash/Jaccard are set-based and
  * blind to character-level edits; a Levenshtein join catches exactly
  * the single-typo / OCR-noise duplicate class.
  *
  * Candidate generation is PARTITION-based (the Pass-Join idiom), not
  * gram-prefix filtering: a single edit sits at ONE position, so two
  * length-24 keys within edit distance 1 agree EXACTLY on their
  * first-12 prefix (edit position > 12) or on their tail-anchored
  * last-12 suffix (edit position ≤ 12 — insert/delete shifts the tail
  * but the last 12 characters come from the shared region either
  * way). Two 12-character segment equi-joins are therefore COMPLETE
  * for d ≤ 1 — and 12-char segments of natural text are nearly
  * unique, so the buckets stay tiny. Gram-prefix filtering was
  * measured first and rejected: documents share aligned common
  * opening words, so even df-ordered rarest-gram prefixes produced
  * 1.16 M candidates at sf0.1 / 50 M at sf1; the segment join
  * produces ~7 k / ~213 k on the same corpora (~200× less), growing
  * linearly with the corpus because segment buckets are
  * vocabulary-bounded, not alignment-bounded.
  * At 100 TB: two shuffles on near-unique 12-char keys, pairs carry
  * (ids, keys) only, and the exact Levenshtein verify runs once per
  * CANDIDATE, not per pair of documents.
  *
  * The join key is the normalized 24-char text prefix; planted twins
  * (doc_id % 10 = 7 → doc_id + 4·PlantOffset) substitute one
  * id-derived character, so the expected pair set is non-empty and
  * id-predictable. The oracle is the BRUTE-FORCE O(n²) Levenshtein
  * join over the same planted key set — completeness and
  * no-false-positives in one hash check.
  */
object EditDist {

  private val KeyLen = 24
  private val SegLen = KeyLen / 2
  private val TwinTier = 4     // doc_id + 4·PlantOffset (tiers 1-3 are NearDup's)

  /** Normalized fixed-length join key. */
  private def keyed(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        lower(substring(regexp_replace(col("text"), "\\s+", " "), 1, KeyLen)).as("key"))

  /** Corpus ∪ single-character-substitution twins. */
  def plantedKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val k = keyed(spark, sfDir)
    NearDup.guardIds(k, "doc_id")
    // splice 'q' at position (doc_id % 20) + 1 — id-derived, replanted
    // identically in the oracle; if the original char IS 'q' the twin
    // sits at distance 0, which the d ≤ 1 contract still captures
    val twins = k.filter(col("doc_id") % 10 === 7)
      .select(
        (col("doc_id") + TwinTier * Dedup.PlantOffset).as("doc_id"),
        concat(
          col("key").substr(lit(1), (col("doc_id") % 20).cast("int")),
          lit("q"),
          col("key").substr((col("doc_id") % 20).cast("int") + 2, lit(KeyLen))).as("key"))
    k.unionByName(twins)
  }

  /** All doc-id pairs with Levenshtein(key_a, key_b) ≤ 1, via the
    * two-segment partition join + exact verify.
    */
  def editDistPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val segs = plantedKeys(spark, sfDir)
      .select(col("doc_id"), col("key"),
        substring(col("key"), 1, SegLen).as("pre"),
        // tail-anchored: the LAST SegLen characters
        col("key").substr(length(col("key")) - (SegLen - 1), lit(SegLen)).as("suf"))

    // the 2-segment cover is only complete for keys of ≥ 2·SegLen
    // chars — corpus docs guarantee it (n_chars ≥ 44); fail loudly if
    // a future corpus does not rather than silently losing recall
    val short = segs.filter(length(col("key")) < KeyLen).limit(1).count()
    require(short == 0,
      s"editDistPairs: keys shorter than $KeyLen chars break the 2-segment completeness cover")

    def pairsOn(seg: String): DataFrame =
      segs.as("a").join(segs.as("b"),
        col(s"a.$seg") === col(s"b.$seg") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.key").as("key_a"), col("b.key").as("key_b"))

    pairsOn("pre").unionByName(pairsOn("suf"))
      .distinct()
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }
}
