package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val data = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("codebooks have m x ksub centroids of the sub dimension") {
    val books = Pq.trainCodebooks(data, m = 8, ksub = 16, iters = 2)
    assert(books.length == 8)
    books.foreach { b =>
      assert(b.length == 16)
      b.foreach(c => assert(c.length == 8)) // 64 / 8
    }
  }

  test("codes are in range and identical vectors encode identically") {
    val books = Pq.trainCodebooks(data, m = 8, ksub = 16, iters = 2)
    val doubled = data.unionByName(
      data.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val codes = Pq.encode(doubled, books)
    val rows = codes.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (_, cs) =>
      assert(cs.length == 8)
      cs.foreach(c => assert(c >= 0 && c < 16, s"code out of range: $c"))
    }
    // the planted exact copy must carry the exact same code word
    rows.keys.filter(_ < 1000000L).foreach { id =>
      assert(rows(id) == rows(id + 1000000L), s"copy of $id encodes differently")
    }
  }

  test("planted exact duplicates come back top-1 at cosine 1.0") {
    val planted = Ann.plantedEmbeddings(spark, sf0001, plantEvery = 50, offset = 1000000L)
    val probes = data.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val top1 = Pq.pqTopKOf(planted, probes, k = 1).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id") + 1000000L,
        s"probe ${r.getAs[Long]("probe_id")} missed its planted copy")
      assert(r.getAs[Double]("cosine") == 1.0)
    }
  }

  test("recall contract holds on the dense clustered corpus") {
    val rows = Pq.pqRecallAtK(spark, sf0001).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("method") == "pq")
    assert(rows(0).getAs[Boolean]("planted_ok"))
    assert(rows(0).getAs[Boolean]("recall_ok"))
  }

  test("ivf-pq composition finds planted duplicates top-1 at cosine 1.0") {
    val rows = Pq.ivfPqPlantedTop1(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("probe_id") + 1000000L)
      assert(r.getAs[Double]("cosine") == 1.0)
    }
  }

  test("ivf-pq recall on the dense clustered corpus stays high") {
    val clustered = Ann.clusteredEmbeddings(spark, sf0001).localCheckpoint()
    val probes = clustered
      .filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val brute = Ann.bruteForceTopKOf(clustered, probes, 10)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    val hits = brute.join(
      Pq.ivfPqTopKOf(clustered, probes, 10).select("probe_id", "neighbor_id"),
      Seq("probe_id", "neighbor_id")).count()
    val recall = hits.toDouble / nTruth
    assert(recall >= 0.90, s"ivf-pq recall@10 = $recall")
  }

  test("rerank bounds ADC ranks monotonically without splitting tie groups") {
    import spark.implicits._
    val clustered = Ann.clusteredEmbeddings(spark, sf0001).localCheckpoint()
    val probes = clustered
      .filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val brute = Ann.bruteForceTopKOf(clustered, probes, 10)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    def recall(rerank: Int): Double = {
      val hits = brute.join(
        Pq.pqTopKOf(clustered, probes, 10, rerank = rerank)
          .select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id")).count()
      hits.toDouble / nTruth
    }
    // rerank counts distinct ADC ranks and rank() keeps whole tie
    // groups: cluster-mates share one code tuple = one rank, so a
    // starved budget degrades gracefully instead of cliffing. A 5-ROW
    // cap would mathematically bound recall@10 at 0.5 — observing well
    // above that proves tie groups were never split at the cutoff.
    val starved = recall(5)
    val full = recall(50)
    assert(starved > 0.5, s"tie-group inclusion should hold rerank=5 recall above " +
      s"the 0.5 row-cap ceiling, got $starved")
    assert(starved <= full + 1e-9, s"recall must be monotone in rerank: $starved vs $full")
  }
}
