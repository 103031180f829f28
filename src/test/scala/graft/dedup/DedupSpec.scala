package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup operators over a controlled corpus: exact copies, a near-dup
  * pair (one word changed), and unrelated docs — each pipeline must
  * find exactly the planted structure.
  */
class DedupSpec extends SparkSpec {

  /** Write a tiny documents.parquet with planted duplicates and return
    * its directory (the pipelines read `$dir/documents.parquet`).
    */
  private lazy val corpusDir: String = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val near = "the quick brown fox jumps over the lazy cat and runs far away home tonight"
    val docs = Seq(
      (0L, base, "en", "test", base.length),
      (1L, base, "en", "test", base.length),                 // exact dup of 0
      (2L, near, "en", "test", near.length),                 // near dup of 0/1
      (3L, "completely different text about spark query engines and shuffles", "en", "test", 64),
      (4L, "yet another unrelated document mentioning parquet files and columnar scans", "en", "test", 74)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-spec-").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup counts the planted copy group") {
    val row = Dedup.exact(spark, corpusDir).collect()(0)
    assert(row.getAs[Long]("n_unique") == 4)     // 5 docs, one exact pair
    assert(row.getAs[Long]("n_dup_groups") == 1)
    assert(row.getAs[Long]("n_removed") == 1)
    val survivors = Dedup.exactSurvivors(spark, corpusDir).collect()
    assert(survivors.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 2L, 3L, 4L))
  }

  test("minhash LSH finds exact and near dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashLsh(spark, corpusDir, jaccardThreshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      s"near dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      s"unrelated docs must not pair: $pairs")
    // exact copies have identical shingle sets -> jaccard exactly 1.0
    val j01 = Dedup.minhashLsh(spark, corpusDir)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .collect()(0).getAs[Double]("jaccard")
    assert(j01 == 1.0)
  }

  test("simhash: identical docs collide at hamming 0; near dups within band distance") {
    val dups = Dedup.simhashDedup(spark, corpusDir, maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    val d01 = dups.find(d => d._1 == 0L && d._2 == 1L)
    assert(d01.exists(_._3 == 0), s"exact dup pair must have hamming 0: $dups")
    assert(!dups.exists(d => d._1 == 3L || d._2 == 3L || d._1 == 4L || d._2 == 4L))
  }

  test("ngram jaccard of consecutive docs: identical pair scores 1.0") {
    val rows = Dedup.ngramJaccardConsecutive(spark, corpusDir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Double]("jaccard"))).toMap
    assert(rows(0L) == 1.0)          // doc 0 vs doc 1: identical text
    assert(rows(2L) < 0.5)           // doc 2 vs doc 3: unrelated
    assert(rows(1L) > 0.8)           // doc 1 vs doc 2: one word changed
  }

  test("bucket cap drops mega-buckets from candidate generation") {
    // cap below the planted dup-group size -> its bucket is skipped in
    // every band, so no pairs; a generous cap finds them again.
    val capped = Dedup.minhashCandidates(spark, corpusDir, bucketCap = 1).count()
    assert(capped == 0, s"cap=1 must suppress all buckets, got $capped pairs")
    val uncapped = Dedup.minhashCandidates(spark, corpusDir, bucketCap = 100).count()
    assert(uncapped > 0)
  }

  test("minhash summary on real data is a single non-empty row") {
    val row = Dedup.minhashSummary(spark, sf0001).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("n_docs") == 500)
  }

  test("embedding near-dup: no false positives on the orthogonal-ish corpus") {
    // sf0.001 embeddings have max pairwise cosine < 0.95, so the
    // verified near-dup set must be empty while candidates still flow.
    val row = Dedup.embeddingSummary(spark, sf0001).collect()(0)
    assert(row.getAs[Long]("n_candidate_pairs") > 0)
    assert(row.getAs[Long]("n_near_dup_pairs") == 0)
    assert(row.getAs[Double]("max_cosine") < 0.95)
  }
}
