package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  test("brute-force top-k: k neighbors per probe, ranked by cosine, self excluded") {
    val res = Ann.bruteForceTopK(spark, sf0001, k = 5, probeEvery = 100).collect()
    val byProbe = res.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 5) // vec_ids 0,100,200,300,400
    byProbe.foreach { case (probe, rows) =>
      assert(rows.length == 5)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == probe), "self must be excluded")
      val cos = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, "ranked descending")
    }
  }

  test("one-scan graded fan-out is bit-identical to the fold of rotatedTo unions") {
    // clusteredEmbeddings switched from `members` union branches to one
    // explode scan; every planted recall contract hashes these floats,
    // so the two constructions must agree to the BIT.
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").select("vec_id", "embedding")
    val centers = e.filter(pmod(col("vec_id"), lit(20)) === 0)
    val offset = 1000000L
    val oldWay = (1 to 12).foldLeft(e) { (acc, j) =>
      acc.unionByName(
        graft.dedup.NearDup.rotatedTo(centers, 1.0 - 0.01 * j)
          .select((col("vec_id") + j * offset).as("vec_id"), col("embedding")))
    }.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val newWay = Ann.clusteredEmbeddings(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(newWay.keySet == oldWay.keySet)
    newWay.keys.foreach { id =>
      assert(newWay(id) == oldWay(id), s"vec $id differs between constructions")
    }
  }

  test("bounded-probe LSH/IVF scans are row-identical to the join pipelines") {
    // KeyedTopKAgg replaces the candidate-pair join + sort window for
    // bounded probe sets; the recall contract routes through it, so the
    // two formulations must agree to the row (ids, ranks AND cosines).
    val data = Ann.clusteredEmbeddings(spark, sf0001).localCheckpoint()
    val probes = data
      .filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "rk", "neighbor_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(rows(Ann.lshTopKBounded(data, probes, 10, 8, 6)) ==
      rows(Ann.lshTopKOf(data, probes, 10, 8, 6)), "LSH bounded != join")
    assert(rows(Ivf.ivfTopKBounded(data, probes, 10, 16, 4)) ==
      rows(Ivf.ivfTopKOf(data, probes, 10, 16, 4)), "IVF bounded != join")
  }

  test("LSH top-k is a subset-quality approximation of brute force") {
    val row = Ann.lshSummary(spark, sf0001, k = 5, probeEvery = 100).collect()(0)
    assert(row.getAs[Long]("n_probes") == 5)
    assert(row.getAs[Long]("n_brute_results") == 25)
    assert(row.getAs[Long]("n_lsh_results") <= 25)
    // multi-table LSH on near-orthogonal data: recall well above random.
    // Random top-5 of 499 would land ~1% of brute's list; require >= 20%.
    assert(row.getAs[Double]("recall") >= 0.2, s"recall ${row.getAs[Double]("recall")}")
  }

  test("LSH recall knob: more tables never hurts, fewer planes never hurts recall") {
    // The tuning contract a deployment relies on: nTables multiplies
    // the chance a true neighbor shares >= 1 bucket (union of tables),
    // planesPerTable sharpens buckets (higher precision, lower recall).
    // Deterministic seeds make the realized recalls reproducible.
    def recallAt(nTables: Int, planes: Int): Double =
      Ann.lshSummary(spark, sf0001, k = 5, probeEvery = 100,
        nTables = nTables, planesPerTable = planes)
        .collect()(0).getAs[Double]("recall")
    val r2 = recallAt(2, 6); val r8 = recallAt(8, 6); val r16 = recallAt(16, 6)
    assert(r2 <= r8 + 1e-9 && r8 <= r16 + 1e-9,
      s"recall must not degrade with more tables: $r2 -> $r8 -> $r16")
    val rCoarse = recallAt(8, 3)
    assert(rCoarse >= r8 - 1e-9,
      s"coarser buckets (fewer planes) must not lower recall: $rCoarse vs $r8")
  }

  test("tableBuckets is deterministic and table-distinct") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(10)
      .select(col("vec_id"), Ann.tableBuckets(col("embedding"), 4, 6).as("tb"))
    val a = df.collect().map(r => r.getAs[Long](0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq))
    val b = df.collect().map(r => r.getAs[Long](0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq))
    assert(a.toSeq == b.toSeq, "bucket assignment must be reproducible")
    // different tables use different hyperplanes -> bucket patterns differ
    val perTable = a.toSeq.map(_._2.map(_(1)).toSeq).transpose.map(_.toSet)
    assert(perTable.distinct.length > 1)
  }

  test("IVF: every vector lands in exactly one list; recall beats random") {
    val data = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cent = Ivf.trainCentroids(data, nLists = 8, iters = 2)
    assert(cent.count() == 8)
    val idx = Ivf.assign(data, cent)
    assert(idx.count() == data.count())
    assert(idx.select("vec_id").distinct().count() == data.count())
    val row = Ivf.ivfSummary(spark, sf0001, k = 5, probeEvery = 100,
      nLists = 8, nProbe = 3).collect()(0)
    assert(row.getAs[Long]("n_probes") == 5)
    // scanning 3/8 of the corpus must recover well above the ~1% random
    // baseline; with near-orthogonal vectors expect roughly >= nProbe/nLists.
    assert(row.getAs[Double]("recall") >= 0.25, s"recall ${row.getAs[Double]("recall")}")
  }

  test("recall@10 on dense clusters: both methods clear their pins, and the pin has teeth") {
    val rows = Ann.annRecallAtK(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "lsh"))
    rows.foreach(r => assert(r.getBoolean(1) && r.getBoolean(2),
      s"${r.getString(0)} failed its recall@k contract: $r"))
    // teeth: a detuned index (2 tables instead of 8) must FAIL the pin —
    // otherwise the contract guards nothing
    val data = Ann.clusteredEmbeddings(spark, sf0001).localCheckpoint()
    val probes = data
      .filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val brute = Ann.bruteForceTopKOf(data, probes, 10).select("probe_id", "neighbor_id")
    val nTruth = brute.count()
    val detunedHits = brute.join(
      Ann.lshTopKOf(data, probes, 10, nTables = 2, planesPerTable = 6)
        .select("probe_id", "neighbor_id"),
      Seq("probe_id", "neighbor_id")).count()
    assert(detunedHits.toDouble / nTruth < 0.95,
      s"detuned LSH still clears the pin (${detunedHits.toDouble / nTruth}) — pin too weak")
  }

  test("hyperplanes are seed-deterministic") {
    val p1 = Ann.hyperplanes(4, 8, seed = 7L)
    val p2 = Ann.hyperplanes(4, 8, seed = 7L)
    val p3 = Ann.hyperplanes(4, 8, seed = 8L)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
    assert(p1.flatten.toSeq != p3.flatten.toSeq)
    assert(p1.flatten.forall(v => v >= -1.0 && v < 1.0))
  }
}
