package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components + near-dup survivor contracts (Cluster):
  * transitive closure over synthetic edge lists, the iteration-cap
  * loud-failure path, and the end-to-end planted-chain manifest at
  * sf0.001 (the oracle pins the same manifest arithmetic at sf0.01).
  */
class ClusterSpec extends SparkSpec {

  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)], maxIters: Int = 15): Map[Long, Long] =
    Cluster.connectedComponents(pairs.toDF("id_a", "id_b"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive closure: a 5-node chain collapses to its min id") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("stars, separate components, and unordered pairs") {
    // star rooted at 10, a reversed-order pair (20 > 7), and a chain
    // whose min sits in the MIDDLE — closure must not depend on pair
    // orientation or on the min being an endpoint.
    val got = components(Seq((10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 7L), (31L, 30L), (30L, 32L)))
    assert(got == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 7L, 7L -> 7L,
      30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("pointer jumping: a 33-node path converges within the default cap") {
    // diameter 32 — plain label propagation would need 32 rounds, the
    // jumped variant lands well under the default 15.
    val edges = (1L until 33L).map(i => (i, i + 1))
    val got = components(edges)
    assert(got.size == 33 && got.values.forall(_ == 1L))
  }

  test("iteration cap is a loud failure, never a partial clustering") {
    val edges = (1L until 33L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      components(edges, maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("survivor manifest at sf0.001 matches the planted-chain arithmetic") {
    val manifest = Cluster.nearDupSurvivors(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val eligible = NearDup.eligibleDocs(spark, sf0001, plantEvery = 2, minTokens = 60)
      .select("doc_id").as[Long].collect().toSet
    val nDocs = docs.count()
    assert(manifest.length == nDocs + 2 * eligible.size)
    manifest.foreach { r =>
      val (id, cluster, keep) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      val expectedCluster = if (id >= Dedup.PlantOffset) id % Dedup.PlantOffset else id
      assert(cluster == expectedCluster, s"doc $id clustered to $cluster")
      assert(keep == (id == cluster), s"doc $id keep=$keep")
    }
    // the contract has teeth: clusters of size 3 actually exist
    assert(eligible.nonEmpty)
  }

  test("leakproof split: clusters never straddle, doc-level hashing would") {
    val census = Cluster.leakproofSplit(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(census.keySet == Set("holdout", "train"))

    // splits PARTITION the chained corpus (base docs + 2 copies per eligible)
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val nElig = NearDup.eligibleDocs(spark, sf0001, plantEvery = 2, minTokens = 60).count()
    assert(census.values.map(_._1).sum == nDocs + 2 * nElig)

    // cluster-level assignment is leak-free BY RECOMPUTATION: every doc
    // of every multi-doc cluster carries its root's split
    def split(id: Long): String = {
      val b1 = id * 2654435761L % 4294967296L
      val s1 = b1 ^ (b1 / 65536L)
      val b2 = s1 * 1540483477L % 4294967296L
      val s2 = b2 ^ (b2 / 8192L)
      if (s2 % 10 < 9) "train" else "holdout"
    }
    val manifest = Cluster.nearDupSurvivors(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val straddling = manifest.groupBy(_._2).values
      .count(c => c.map { case (d, cl) => split(cl) }.distinct.size > 1)
    assert(straddling == 0)

    // the counterfactual has teeth: a doc-level hash split WOULD tear
    // at least one planted chain apart, and the census counts exactly those
    val expectedLeaks = manifest.groupBy(_._2).toSeq.map { case (cl, ds) =>
      split(cl) -> (if (ds.map(d => split(d._1)).distinct.size > 1) 1L else 0L)
    }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    assert(census.map { case (s, (_, _, l)) => s -> l } == expectedLeaks)
    assert(census.values.map(_._3).sum > 0, "planted chains must demonstrate doc-level leakage")
  }
}
