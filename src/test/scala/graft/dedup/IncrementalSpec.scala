package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("batch classes partition the batch and match the construction predicates") {
    val rows = Incremental.incrementalClassify(spark, sf0001).collect()
    val byCat = rows.map(r => r.getAs[String]("category") -> r.getAs[Long]("n_docs")).toMap
    assert(byCat.keySet == Set("exact_dup", "near_dup", "novel"))
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val nExact = d.filter(col("doc_id") % 8 === 0).count()
    val nNear = d.filter(col("doc_id") % 8 === 1 &&
      regexp_count(col("text"), lit("\\S+")) >= 60).count()
    val nNovel = d.filter(col("doc_id") % 8 === 2 &&
      size(Dedup.tokens(col("text"))) >= 3).count()
    assert(byCat("exact_dup") == nExact)
    assert(byCat("near_dup") == nNear)
    assert(byCat("novel") == nNovel)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Incremental.newBatch(spark, sf0001).count())
  }

  test("a verbatim copy also near-matches — precedence keeps it exact") {
    // the %8==0 copies have Jaccard 1.0 vs their source, so the near
    // pipeline sees them too; classification must still say exact_dup
    val batch = Incremental.newBatch(spark, sf0001)
    val old = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val crossNear = Dedup.minhashCandidatesOf(old.unionByName(batch))
      .filter(col("id_a") < Dedup.PlantOffset &&
        col("id_b") >= Incremental.BatchOffset &&
        col("jaccard") >= 0.99)
    assert(crossNear.count() > 0, "exact copies must surface as candidates too")
  }

  test("indexed path: census identical to the self-contained path") {
    val direct = Incremental.incrementalClassify(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val indexed = Incremental.incrementalClassifyIndexed(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(indexed == direct, s"indexed=$indexed direct=$direct")
  }

  test("per-drop plan reads ONLY the index — snapshot text is never re-shingled") {
    // The whole point of the persisted index: with the snapshot baked
    // into parquet, the classify plan's file scans must all point into
    // the index directory. The batch arrives as an in-memory relation
    // here, so ONE scan of documents.parquet anywhere in the plan means
    // the snapshot leaked back into the per-drop path (the O(corpus)
    // re-shingle the index exists to eliminate).
    val indexDir = java.nio.file.Files.createTempDirectory("snapidx-audit").toString
    val old = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    Incremental.writeSnapshotIndex(old, indexDir)
    import spark.implicits._
    val batch = Seq((900000001L, "one tiny drop of text here")).toDF("doc_id", "text")
    val plan = Incremental.classifyAgainstIndex(spark, batch, indexDir)
      .queryExecution.executedPlan.toString
    val scanLocations = plan.linesIterator.filter(_.contains("Location:")).toSeq
    assert(scanLocations.nonEmpty, s"expected index parquet scans:\n$plan")
    scanLocations.foreach { l =>
      assert(l.contains(new java.io.File(indexDir).getName),
        s"every file scan must read the index, got:\n$l")
    }
    assert(!plan.contains("documents.parquet"),
      s"snapshot parquet must not appear in the per-drop plan:\n$plan")
  }

  test("novel docs share no verified near pair with the snapshot") {
    val batch = Incremental.newBatch(spark, sf0001)
      .filter((col("doc_id") - Incremental.BatchOffset) % 8 === 2)
    val old = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val hits = Dedup.minhashCandidatesOf(old.unionByName(batch))
      .filter(col("id_a") < Dedup.PlantOffset &&
        col("id_b") >= Incremental.BatchOffset &&
        col("jaccard") >= Incremental.NearThreshold)
    assert(hits.count() == 0,
      "token reversal + nonce must destroy near-dup similarity")
  }
}
