package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Deduplication operators for a training-data pipeline (SURVEY.md §2c):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every near-dup variant is candidate-generation by
  * bucketing (LSH bands / simhash bands / shared-shingle inverted
  * index) followed by verification ONLY on candidate pairs — never an
  * O(n²) cross join. Bucket joins are plain `groupBy`/self-join on the
  * bucket key, so at 100 TB they shuffle on a well-distributed key and
  * every bucket is small; skewed mega-buckets (boilerplate shingles)
  * are capped explicitly.
  */
object Dedup {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ------------------------------------------------- planted duplicates

  /** Id offset of planted duplicate copies — far above any natural id. */
  val PlantOffset = 1000000L

  /** Corpus with PLANTED near-duplicates: every sufficiently-long
    * `doc_id % plantEvery == 0` document gains a copy at
    * `doc_id + PlantOffset` with one marker token appended.
    *
    * Why: the synthetic corpus is dup-free, so the near-dup pipelines
    * could only ever report "0 verified pairs" — their RECALL was never
    * demonstrated. The planting is pure column arithmetic, reproducible
    * verbatim by an external SQL oracle, which turns recall into a
    * hash-checkable result: one appended token on a >= minChars doc
    * leaves word-shingle Jaccard at ~(S-1)/S ≈ 0.95+, far above every
    * natural pair (max ≈ 0.5), so the planted pairs — and ONLY they —
    * must come out of the band joins and survive verification.
    */
  def plantedDocs(spark: SparkSession, sfDir: String,
                  plantEvery: Int = 20, minChars: Int = 200): DataFrame = {
    val d = docs(spark, sfDir)
    d.select("doc_id", "text").unionByName(
      d.filter(col("doc_id") % plantEvery === 0 && col("n_chars") >= minChars)
        .select((col("doc_id") + PlantOffset).as("doc_id"),
          concat(col("text"), lit(" graftplantmark")).as("text")))
  }

  // -------------------------------------------------------------- exact

  /** Exact dedup by normalized-text hash: one surviving doc (min id)
    * per distinct text + group size. A single map-side-combinable
    * aggregation — the 100 TB-safe formulation (shuffle carries one row
    * per distinct hash, not the texts).
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(lower(col("text"))).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .groupBy()
      .agg(count(lit(1)).as("n_unique"),
        sum(when(col("n_copies") > 1, 1).otherwise(0)).as("n_dup_groups"),
        sum(col("n_copies") - 1).as("n_removed"))

  /** Surviving rows after exact dedup (deterministic keeper = min doc_id). */
  def exactSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    d.groupBy(md5(lower(col("text"))).as("text_hash"))
      .agg(min("doc_id").as("doc_id"))
      .join(d, "doc_id")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  // ----------------------------------------------------------- shingles

  /** Lowercased whitespace tokens of a text column. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles from a PRE-MATERIALIZED token-array column.
    *
    * `toks` must be a bound attribute (a real column), not an expression
    * tree: higher-order array functions are CodegenFallback, so every
    * expression referenced inside the lambda is re-evaluated per array
    * element — an inline `split()` here costs O(tokens) regex splits per
    * shingle, O(T²) per document.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => when(size(toks) >= n, concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull && length(s) > 0))

  /** Word n-gram shingles of the lowercased text — convenience wrapper;
    * prefer materializing [[tokens]] first in multi-step pipelines.
    */
  def shingles(c: Column, n: Int): Column =
    shinglesFromTokens(tokens(c), n)

  // -------------------------------------------------------- minhash/LSH

  /** MinHash signature of a shingle set: hash each shingle string ONCE
    * (xxhash64 → long), then hash function i is xxhash64 over the fixed
    * 12 bytes (h, i) — variable-length string traversal happens once per
    * shingle instead of numHashes times, and the re-hash can't overflow
    * under ANSI mode (an affine a*h+b universal hash would). Columnar
    * variant for ad-hoc use; the batch pipelines use
    * [[minhashSignatures]] (explode + one map-side-combined groupBy).
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column = {
    val hs = transform(shingleCol, sh => xxhash64(sh))
    array((0 until numHashes).map { seed =>
      array_min(transform(hs, h => xxhash64(h, lit(seed))))
    }: _*)
  }

  /** One row per (doc, distinct shingle) — the scalable substrate for
    * signature computation: a single narrow pass, then one map-side
    * combined groupBy carries only the signature through the shuffle.
    */
  private def explodedShingles(d: DataFrame, n: Int): DataFrame =
    d.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shinglesFromTokens(col("toks"), n)).as("shingle"))

  /** MinHash signatures via explode + groupBy with numHashes `min`
    * aggregates: the shingle string is hashed ONCE per row, every hash
    * function is a cheap affine transform of that long, all evaluated in
    * the same single pass, partial-aggregated map-side, and only
    * (doc_id, signature) crosses the shuffle — at corpus scale the
    * shingle text never leaves the mapper.
    */
  def minhashSignatures(spark: SparkSession, sfDir: String,
                        shingleN: Int, numHashes: Int): DataFrame =
    minhashSignaturesOf(docs(spark, sfDir), shingleN, numHashes)

  /** [[minhashSignatures]] over an arbitrary (doc_id, text) frame. */
  def minhashSignaturesOf(d: DataFrame, shingleN: Int, numHashes: Int): DataFrame =
    signaturesFromExploded(
      explodedShingles(d, shingleN).withColumn("h", xxhash64(col("shingle"))),
      numHashes)

  /** [[minhashSignaturesOf]] starting from an ALREADY-SHINGLED
    * (doc_id, sh: array<string>) frame — identical signatures (the
    * shingle sets are the same arrays the text path would build), so a
    * caller that must ALSO materialize the shingle sets (the snapshot
    * index build) tokenizes the corpus once instead of twice.
    */
  def minhashSignaturesFromShingleSets(grams: DataFrame, numHashes: Int): DataFrame =
    signaturesFromExploded(
      grams.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .withColumn("h", xxhash64(col("shingle"))),
      numHashes)

  private def signaturesFromExploded(hashed: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    hashed
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** MinHash + LSH banding near-dup candidate pairs with verified
    * Jaccard. bands*rowsPerBand hash functions; docs agreeing on all
    * rows of any band land in one bucket; candidate pairs are verified
    * with exact Jaccard over shingle sets.
    */
  def minhashLsh(spark: SparkSession, sfDir: String,
                 shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                 jaccardThreshold: Double = 0.5): DataFrame =
    minhashCandidates(spark, sfDir, shingleN, bands, rowsPerBand)
      .filter(col("jaccard") >= jaccardThreshold)
      .orderBy("id_a", "id_b")

  /** Candidate pairs with verified Jaccard, pre-threshold — the full
    * LSH candidate surface (shared by [[minhashLsh]] and the summary).
    *
    * Scale shape: the (band, bucket) self-join carries ONLY doc ids —
    * candidate ids are deduplicated first and the (small) candidate set
    * is then joined back to the shingle table for exact verification.
    * Shuffling the shingle arrays through the LSH join, band-multiplied,
    * is the classic way this pipeline dies at corpus scale.
    */
  /** Drop (band, bucket) groups larger than `cap` before a bucket
    * self-join: an adversarial mega-bucket (boilerplate shingles, empty
    * docs) otherwise generates O(|bucket|²) pairs. Oversized buckets
    * are few by construction, so they broadcast into an anti-join; real
    * dup groups that large are still caught by the OTHER bands/tables.
    *
    * Interaction with the planted-recall oracles: if a bucket holding a
    * planted pair ever exceeded the cap in EVERY band/table, the pair
    * would be dropped and the oracle would flag it. At the test scales
    * buckets are orders of magnitude below the cap; at corpus scale,
    * size the cap (and the simhash band width) with the corpus — the
    * recall contract is the regression alarm for getting that wrong.
    */
  private[graft] def capBuckets(banded: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val oversized = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > cap)
      .select(keys.map(col): _*)
    banded.join(broadcast(oversized), keys, "left_anti")
  }

  def minhashCandidates(spark: SparkSession, sfDir: String,
                        shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                        bucketCap: Int = 10000): DataFrame =
    minhashCandidatesOf(docs(spark, sfDir), shingleN, bands, rowsPerBand, bucketCap)

  /** (doc_id, band, bucket) LSH bucket rows of a signature frame — the
    * band explode shared by the batch pipeline and the persisted
    * snapshot index ([[Incremental.writeSnapshotIndex]]).
    */
  def bandBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))

  /** (doc_id, sh) shingle sets of a (doc_id, text) frame — the
    * exact-Jaccard-verify substrate, also persisted by the snapshot
    * index so candidate verification never re-reads snapshot text.
    */
  def shingleSets(d: DataFrame, shingleN: Int): DataFrame =
    d.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesFromTokens(col("toks"), shingleN).as("sh"))

  /** [[minhashCandidates]] over an arbitrary (doc_id, text) frame.
    *
    * Pass structure (round-15, guide §1.2/§5): the input is tokenized +
    * shingled ONCE — the checkpointed shingle table is BOTH the
    * signature substrate ([[minhashSignaturesFromShingleSets]] — same
    * arrays, identical signatures; the equivalence
    * [[Incremental.writeSnapshotIndex]] already relies on) and the
    * exact-Jaccard verification substrate. The shingle HOFs are
    * CodegenFallback (interpreted per element), so the second full
    * tokenize+shingle pass this removes was the pipeline's single most
    * expensive redundancy. The capped band table is checkpointed too:
    * the bucket self-join references it on BOTH sides, and each side
    * would otherwise re-run the full signature aggregation (the
    * pipeline's one big shuffle) — 3× with the oversized-bucket census.
    * Both checkpoints are bounded by the corpus the caller passes
    * (shingles ~ tokens; bands = 16 ids/doc), the same materialization
    * the persisted snapshot index makes durable at 100 TB. They are
    * LAZY (eager = false): materialization rides the first consuming
    * job instead of adding a sequential driver barrier per table —
    * the first job computes each once, later references read blocks.
    */
  def minhashCandidatesOf(d: DataFrame,
                          shingleN: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                          bucketCap: Int = 10000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val grams = shingleSets(d, shingleN).localCheckpoint(eager = false)
    val sigs = minhashSignaturesFromShingleSets(grams, numHashes)
    val banded = capBuckets(bandBuckets(sigs, bands, rowsPerBand),
      Seq("band", "bucket"), bucketCap).localCheckpoint(eager = false)
    val cand = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(grams.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(grams.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .select("id_a", "id_b", "jaccard")
  }

  /** Single-row MinHash+LSH pipeline summary — non-empty by construction
    * (the synthetic corpus may contain zero near-dups, but the pipeline
    * stats always exist).
    */
  def minhashSummary(spark: SparkSession, sfDir: String,
                     jaccardThreshold: Double = 0.5): DataFrame = {
    val nDocs = docs(spark, sfDir).count()
    minhashCandidates(spark, sfDir)
      .agg(
        lit(nDocs).as("n_docs"),
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("jaccard") >= jaccardThreshold, 1L).otherwise(0L)).as("n_verified_pairs"),
        round(coalesce(max("jaccard"), lit(0.0)), 4).as("max_jaccard"))
  }

  /** Oracle-verified planted-recall query for MinHash+LSH: the full
    * shingle → signature → band → bucket-join → exact-verify pipeline
    * runs over [[plantedDocs]]; the output is the planted pairs it
    * RECOVERED, with their exact verified Jaccard. The SQL oracle
    * recomputes the same word-3-gram Jaccard for every planted pair
    * independently, so one missed band collision, one wrong signature,
    * or one Jaccard off by a rounding step = a hash mismatch.
    */
  def minhashPlantedRecall(spark: SparkSession, sfDir: String,
                           jaccardThreshold: Double = 0.8): DataFrame =
    minhashCandidatesOf(plantedDocs(spark, sfDir))
      .filter(col("id_b") === col("id_a") + PlantOffset &&
        col("jaccard") >= jaccardThreshold)
      .orderBy("id_a")

  // ------------------------------------------------------------ simhash

  /** 64-bit SimHash over word shingles: sign-sum of per-shingle hash
    * bits. Expressed columnar: per-bit popcount-majority via aggregate.
    */
  def simhash(shingleCol: Column): Column = {
    // For each bit position b: count of shingles with bit b set, vs
    // total; simhash bit b = 1 iff 2*count_set > total. Bit positions
    // unrolled at plan-build time (64 literal positions) so the whole
    // computation is one codegen'd expression, no UDF.
    val hashes = transform(shingleCol, sh => xxhash64(sh))
    val total = size(shingleCol)
    val bits = (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftrightunsigned(h, b).bitwiseAND(1).cast("int"))
      when(cnt * 2 > total, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** 64-bit SimHash fingerprints for every document, computed the
    * scalable way: explode shingles, hash once per shingle, then ONE
    * map-side-combined groupBy with the custom
    * [[graft.functions.SimHashAgg]] aggregate (a 65-counter buffer —
    * 520 bytes per group through the partial/final shuffle, versus a
    * 65-column row for the equivalent per-bit `sum(...)` formulation).
    * The columnar [[simhash]] expression does 64 array traversals per
    * row — fine for a handful of docs, quadratic waste over a corpus.
    */
  def simhashFingerprints(spark: SparkSession, sfDir: String,
                          shingleN: Int = 2): DataFrame =
    simhashFingerprintsOf(docs(spark, sfDir), shingleN)

  /** [[simhashFingerprints]] over an arbitrary (doc_id, text) frame. */
  def simhashFingerprintsOf(d: DataFrame, shingleN: Int = 2): DataFrame =
    explodedShingles(d, shingleN)
      .groupBy("doc_id")
      .agg(graft.functions.GraftFunctions.simhash_agg(xxhash64(col("shingle"))).as("sim"))

  /** SimHash near-dup candidate pairs: 4 × 16-bit bands with HAMMING-1
    * MULTIPROBE on the query side (each band bucket is probed at its
    * exact value plus all 16 single-bit flips — multi-probe LSH), plus
    * HAMMING-2 probes on band 0 only. The pigeonhole guarantee is then
    * COMPLETE for the verification bound: a pair within hamming ≤ 7
    * must have some band with ≤ 1 differing bit (radius-1 catches it),
    * and a hamming-8 pair either has such a band too or is split
    * exactly (2,2,2,2) — in which case band 0 carries exactly 2 flips
    * and the band-0 radius-2 probes catch it (observed in the wild:
    * one sf1 planted pair landed on that split). So candidate
    * generation is STRUCTURAL for hamming ≤ 8, not probabilistic —
    * which is what lets an external oracle demand full recall on
    * planted near-dups. The 16-bit bucket space (65536 per band) keeps
    * natural buckets sparse at corpus scale; multiprobe multiplies
    * only the ids-only probe side (17 probes on bands 1-3, 137 on
    * band 0 ≈ 2.8× radius-1's volume), never the fingerprint payload.
    */
  private def simhashCandidates(spark: SparkSession, sfDir: String,
                                shingleN: Int, bucketCap: Int = 10000): DataFrame =
    simhashCandidatesOf(docs(spark, sfDir), shingleN, bucketCap)

  private[graft] def simhashCandidatesOf(d: DataFrame,
                                         shingleN: Int, bucketCap: Int = 10000): DataFrame = {
    // NO checkpoint here, deliberately (round-15): the fingerprint
    // aggregation ends in an exchange that every downstream reference
    // shares, so ReuseExchange already evaluates it once per query —
    // a measured checkpoint variant only added materialization cost
    // (dedup_simhash_near 2.74 → 3.11 s).
    val fp = simhashFingerprintsOf(d, shingleN)
    val banded = capBuckets(
      fp.select(
        col("doc_id"), col("sim"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("bucket"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("sim"), col("bb.band"), col("bb.bucket")),
      Seq("band", "bucket"), bucketCap)
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("sim").as("sim_a"))
    // Query side probes bucket ⊕ {0, 1<<0 … 1<<15} on every band, and
    // additionally ⊕ all two-bit masks on band 0 (the (2,2,2,2)-split
    // cover — see the structural bound above). Both orientations of a
    // qualifying pair materialize, so the id_a < id_b filter below
    // still sees every pair exactly once.
    val singles = (0 until 16).map(1L << _)
    val doubles = for { i <- 0 until 16; j <- i + 1 until 16 } yield (1L << i) | (1L << j)
    val flips1 = array((0L +: singles).map(lit): _*)
    val flips2 = array((0L +: (singles ++ doubles)).map(lit): _*)
    val r = banded
      .select(col("doc_id").as("id_b"), col("sim").as("sim_b"), col("band"),
        explode(when(col("band") === 0, flips2).otherwise(flips1)).as("flip"), col("bucket"))
      .select(col("id_b"), col("sim_b"), col("band"),
        col("bucket").bitwiseXOR(col("flip")).as("bucket"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
  }

  def simhashDedup(spark: SparkSession, sfDir: String,
                   shingleN: Int = 2, maxHamming: Int = 8): DataFrame =
    simhashCandidates(spark, sfDir, shingleN)
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")

  /** Single-row SimHash pipeline summary (banded candidates + hamming
    * verification) — non-empty even on a dup-free corpus.
    */
  def simhashSummary(spark: SparkSession, sfDir: String,
                     shingleN: Int = 2, maxHamming: Int = 8): DataFrame = {
    val nDocs = docs(spark, sfDir).count()
    simhashCandidates(spark, sfDir, shingleN).agg(
      lit(nDocs).as("n_docs"),
      count(lit(1)).as("n_candidate_pairs"),
      sum(when(col("hamming") <= maxHamming, 1L).otherwise(0L)).as("n_dup_pairs"),
      coalesce(min("hamming"), lit(64)).as("min_hamming"))
  }

  /** Oracle-verified planted-recall query for SimHash: fingerprint →
    * 4×16-bit band join → hamming verification over [[plantedDocs]];
    * the oracle (pure id arithmetic over the planting rule) expects a
    * row for EVERY planted pair.
    *
    * Two branches make that contract both content-robust and strict:
    * pairs within the hamming-≤`maxHamming` near-dup bound must come
    * back FROM THE BANDED INDEX (an index miss = a missing row = a red
    * oracle), while pairs the mutation pushed PAST the bound — a
    * content-dependent tail: how many fingerprint bits an appended
    * token flips depends on the doc's shingle margins, and e.g. the
    * sf1 corpus's per-copy vocabularies land 16 of 1903 plants at
    * hamming ≥ 9 — are audited by an EXACT fingerprint join and passed
    * through. Those are correct exclusions by the operator's own
    * definition (they are not near-dups), so hiding them from the
    * recall contract would be wrong, and silently widening maxHamming
    * would weaken the operator; the exact-audit branch records them
    * without letting the index off the hook for anything inside the
    * bound. Multiprobe keeps candidate generation STRUCTURAL for
    * hamming ≤ 7 (pigeonhole); an in-bound pair at hamming 8 split
    * exactly (2,2,2,2) across bands remains the one probabilistic
    * edge (never observed on the deterministic corpora).
    */
  def simhashPlantedRecall(spark: SparkSession, sfDir: String,
                           maxHamming: Int = 8): DataFrame = {
    val planted = plantedDocs(spark, sfDir)
    val viaIndex = simhashCandidatesOf(planted, shingleN = 2)
      .filter(col("id_b") === col("id_a") + PlantOffset && col("hamming") <= maxHamming)
      .select("id_a", "id_b")
    val fp = simhashFingerprintsOf(planted, shingleN = 2)
    val beyondBound = fp.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
      .join(fp.select((col("doc_id") - PlantOffset).as("id_a"), col("sim").as("sim_b")), "id_a")
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) > maxHamming)
      .select(col("id_a"), (col("id_a") + PlantOffset).as("id_b"))
    viaIndex.unionByName(beyondBound).orderBy("id_a")
  }

  /** Candidate pairs for embedding-cosine near-dup with exact cosine:
    * L-table random-hyperplane LSH (recall ≈ 1-(1-p^b)^L — near-1 for
    * cosine ≥ 0.95 at 8×8), ids deduplicated across tables BEFORE the
    * embeddings are joined back for verification.
    */
  private def embeddingCandidates(spark: SparkSession, sfDir: String,
                                  nTables: Int, planesPerTable: Int,
                                  bucketCap: Int = 10000): DataFrame =
    embeddingCandidatesOf(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), nTables, planesPerTable, bucketCap)

  private[graft] def embeddingCandidatesOf(emb: DataFrame,
                                           nTables: Int, planesPerTable: Int,
                                           bucketCap: Int = 10000): DataFrame = {
    // checkpointed (round-15, guide §5): both sides of the bucket
    // self-join plus the oversized census reference this table, and
    // each reference would re-run the hyperplane projection (nTables ×
    // planesPerTable dot products per vector). nTables ids/vector.
    val banded = capBuckets(
      emb.select(col("vec_id"),
        explode(graft.similarity.Ann.tableBuckets(col("embedding"), nTables, planesPerTable)).as("tb"))
        .select(col("vec_id"), col("tb.table"), col("tb.bucket")),
      Seq("table", "bucket"), bucketCap).localCheckpoint(eager = false)
    val pairIds = banded.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
      .join(banded.select(col("table"), col("bucket"), col("vec_id").as("id_b")),
        Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairIds
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), "id_b")
      .withColumn("cosine", round(VectorOps.cosine(col("e_a"), col("e_b")), 4))
      .select("id_a", "id_b", "cosine")
  }

  /** Single-row embedding-cosine near-dup summary: LSH-bucketed
    * candidates verified with exact cosine against the threshold.
    */
  def embeddingSummary(spark: SparkSession, sfDir: String,
                       threshold: Double = 0.95, nTables: Int = 8,
                       planesPerTable: Int = 8): DataFrame = {
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    embeddingCandidates(spark, sfDir, nTables, planesPerTable)
      .agg(
        lit(nVecs).as("n_vecs"),
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("cosine") >= threshold, 1L).otherwise(0L)).as("n_near_dup_pairs"),
        round(coalesce(max("cosine"), lit(0.0)), 4).as("max_cosine"))
  }

  // ------------------------------------------------- n-gram jaccard (oracle-able)

  /** Character-3-gram Jaccard for consecutive doc pairs (doc_id,
    * doc_id+1) — a linear, fully deterministic slice of the pairwise
    * similarity surface that an external SQL oracle can verify; the
    * scalable all-pairs path is [[minhashLsh]].
    */
  def ngramJaccardConsecutive(spark: SparkSession, sfDir: String, n: Int = 3): DataFrame = {
    // s materialized as a column before the lambda references it — see
    // shinglesFromTokens for why (per-element re-evaluation otherwise).
    def grams(s: Column): Column =
      array_distinct(
        filter(transform(sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
          i => s.substr(i, lit(n))),
          g => length(g) === n))
    val d = docs(spark, sfDir)
      .select(col("doc_id"), lower(regexp_replace(col("text"), "\\s+", " ")).as("s"))
      .select(col("doc_id"), grams(col("s")).as("g"))
      // checkpointed: BOTH join sides read the gram arrays, and the HOF
      // gram builder is CodegenFallback (interpreted per element) — the
      // expensive pass would otherwise run twice per doc (round-14).
      // Lazy (round-15): the single consuming job materializes it, so
      // no separate driver barrier precedes the join.
      .localCheckpoint(eager = false)
    val a = d.select(col("doc_id").as("id_a"), col("g").as("g_a"))
    val b = d.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"), col("g").as("g_b"))
    a.join(b, "id_a")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))), 4).as("jaccard"))
      .orderBy("id_a")
  }

  // --------------------------------------------------- embedding cosine

  /** Embedding-cosine near-dup pairs: candidates from L-table
    * random-hyperplane LSH buckets, verified with exact cosine ≥ threshold.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String,
                       threshold: Double = 0.95, nTables: Int = 8,
                       planesPerTable: Int = 8): DataFrame =
    embeddingCandidates(spark, sfDir, nTables, planesPerTable)
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")

  /** Oracle-verified planted-recall query for embedding-cosine dedup:
    * exact copies of every `vec_id % plantEvery == 0` vector are planted
    * at `vec_id + PlantOffset`; identical vectors land in identical
    * buckets in EVERY hash table, so the L-table LSH must recover every
    * planted pair with cosine 1.0 — the oracle is the planting rule
    * itself. Natural pairs stay far below the 0.95 threshold (max
    * pairwise cosine ≈ 0.5 on this corpus).
    */
  def embeddingPlantedRecall(spark: SparkSession, sfDir: String,
                             threshold: Double = 0.95, plantEvery: Int = 25,
                             nTables: Int = 8, planesPerTable: Int = 8): DataFrame =
    embeddingCandidatesOf(
      graft.similarity.Ann.plantedEmbeddings(spark, sfDir, plantEvery, PlantOffset),
      nTables, planesPerTable)
      .filter(col("id_b") === col("id_a") + PlantOffset && col("cosine") >= threshold)
      .orderBy("id_a")
}
