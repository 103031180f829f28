package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HnswSpec extends SparkSpec {

  /** Deterministic toy vectors: two tight clusters far apart plus
    * scattered background — the shape where navigability (not
    * brute-force coverage) decides recall.
    */
  private def toyVecs(n: Int, dim: Int = 16): Array[Array[Double]] =
    Array.tabulate(n) { i =>
      val v = Array.tabulate(dim) { d =>
        // LCG-scrambled deterministic "random" background
        val x = (i * 2862933555777941757L + d * 3037000493L + 12345L)
        ((x % 1000).toDouble / 500.0) - 1.0
      }
      if (i % 10 == 0) Array.tabulate(dim)(d => if (d == 0) 10.0 else (i % 7) * 0.01)
      else if (i % 10 == 1) Array.tabulate(dim)(d => if (d == 1) 10.0 else (i % 7) * 0.01)
      else v
    }

  test("graph build is deterministic and respects the 2m degree cap") {
    val vecs = toyVecs(300)
    val p = Hnsw.Params(m = 6, efConstruction = 24)
    val g1 = Hnsw.build(vecs, p)
    val g2 = Hnsw.build(vecs, p)
    assert(g1.length == g2.length)
    g1.indices.foreach { i =>
      assert(g1(i).sameElements(g2(i)), s"node $i adjacency differs between builds")
      assert(g1(i).length <= 2 * p.m, s"node $i degree ${g1(i).length} > ${2 * p.m}")
      assert(g1(i).toSet.size == g1(i).length, s"node $i has duplicate edges")
      assert(!g1(i).contains(i), s"node $i has a self loop")
    }
    // every non-entry node got linked: the insert loop links each new
    // node to >= 1 existing node, so no isolated vertices
    assert(g1.indices.count(i => g1(i).isEmpty) <= 1)
  }

  test("ann_hnsw contract: both methods clear the pin, budget respected, at sf0.001") {
    val rows = Hnsw.annHnsw(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(rows.keySet == Set("hnsw", "ivf_budget_ref"))
    assert(rows("hnsw") == ((true, true, true)), s"hnsw row: ${rows("hnsw")}")
    assert(rows("ivf_budget_ref")._2, "the reference IVF row must clear the same pin")
  }

  test("per-shard eval accounting never exceeds the cap, and the cap has teeth") {
    import spark.implicits._
    val data = Ann.clusteredEmbeddings(spark, sf0001).localCheckpoint()
    val probes = Ann.sampleProbes(
      data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0), 50)
    val p = Hnsw.Params()
    val cap = 60
    val cands = Hnsw.searchShards(data, probes, 10, p, cap)
    val maxEv = cands.agg(max("evals")).head().getLong(0)
    assert(maxEv <= cap, s"shard eval count $maxEv exceeded cap $cap")
    // teeth: an uncapped search on the same shards does more work
    val free = Hnsw.searchShards(data, probes, 10, p, Int.MaxValue)
    val maxFree = free.agg(max("evals")).head().getLong(0)
    assert(maxFree > cap, s"uncapped search ($maxFree evals) should exceed the tight cap")
  }

  test("eval accounting covers EVERY (probe, shard) pair — zero-answer searches included") {
    import spark.implicits._
    val data = Ann.clusteredEmbeddings(spark, sf0001).localCheckpoint()
    val probes = Ann.sampleProbes(
      data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0), 20)
    val p = Hnsw.Params()
    // a tiny cap forces degenerate beams (some shards find only the
    // probe's own copy → zero answer rows pre-fix); the sentinel row
    // must keep the (probe, shard) pair visible to the budget sum
    val cands = Hnsw.searchShards(data, probes, 10, p, 1)
    val pairs = cands.select("probe_id", "shard").distinct().count()
    val nProbes = probes.count()
    assert(pairs == nProbes * p.shards,
      s"accounting saw $pairs (probe, shard) pairs, expected ${nProbes * p.shards}")
    // and the sentinel never reaches the answer surface
    assert(Hnsw.topK(cands, 10).filter(col("neighbor_id") === -1L).count() == 0)
  }

  test("a shard above maxShardRows fails loudly, naming the fix") {
    import spark.implicits._
    val data = Ann.clusteredEmbeddings(spark, sf0001)
    val probes = Ann.sampleProbes(
      data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0), 5)
    val e = intercept[org.apache.spark.SparkException] {
      Hnsw.searchShards(data, probes, 10,
        Hnsw.Params(shards = 2, maxShardRows = 10), 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("raise Params.shards")))
  }
}
