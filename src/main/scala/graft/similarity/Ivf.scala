package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside [[Ann]]'s LSH: a k-means coarse quantizer partitions the
  * corpus into nLists inverted lists; a query scans only the lists of
  * its nProbe nearest centroids.
  *
  * Scale design: every per-vector step is a single scan + broadcast
  * (centroids are k×dim doubles — bytes, not data); assignment uses the
  * codegen [[VectorOps.distSq]] against a broadcast centroid table and
  * a min-by window. Centroid updates aggregate by (list, dimension)
  * with map-side combine, so the shuffle carries k×dim partial sums per
  * partition regardless of corpus size. Only the k centroids ever reach
  * the driver. At 100 TB: nLists scales with √n (classic IVF sizing),
  * keeping list scans bounded; the index build is a handful of linear
  * passes.
  */
object Ivf {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Deterministic k-means (Lloyd) centroids as a small DataFrame
    * (list_id, cvec). Init = evenly spaced vec_ids (reproducible, no
    * RNG); `iters` refinement passes.
    */
  def trainCentroids(data: DataFrame, nLists: Int, iters: Int = 3): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    var cent = initCentroids(data, nLists)
    for (_ <- 1 to iters) {
      // assignWithVec carries the embedding THROUGH the assignment
      // instead of re-joining assignments back to `data` — one shuffle
      // per Lloyd pass saved (the join would shuffle the full corpus on
      // vec_id every iteration).
      val updated = assignWithVec(data, cent)
        .select(col("list_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy("list_id", "i")
        .agg(avg(col("x").cast("double")).as("c"))
        .groupBy("list_id")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
          s => s.getField("c")).as("cvec"))
      // Materialize each iteration's k centroids to the driver (k×dim
      // doubles — bytes) and rebuild a local frame: otherwise every
      // iteration's plan nests the previous one, recomputing the whole
      // history per pass, and a persist() here would leak cached data
      // into the session for the caller to forget.
      val rows = updated.as[(Int, Seq[Double])].collect().sortBy(_._1)
      cent = rows.toSeq.toDF("list_id", "cvec")
    }
    cent
  }

  /** The deterministic Lloyd seed: every `spacing`-th vec_id relative
    * to min(vec_id), so OFFSET id spaces (planted corpora live at
    * large bases, e.g. Opq.OpqOffset) seed nLists centroids too; for
    * natural corpora minId = 0 and the arithmetic is unchanged. Public
    * so contracts can pin Lloyd's objective against its own seed
    * (graft.dedup.Semantic.clusterRecall's `fit` row).
    */
  def initCentroids(data: DataFrame, nLists: Int): DataFrame = {
    val (n, minId) = {
      val r = data.agg(count(lit(1)), min(col("vec_id").cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val spacing = math.max(n / nLists, 1L)
    data
      .filter(pmod(col("vec_id") - minId, lit(spacing)) === 0 &&
        col("vec_id") - minId < spacing * nLists)
      .select(((col("vec_id") - minId) / spacing).cast("int").as("list_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
  }

  /** [[trainCentroids]] on a bounded deterministic id-hash sample
    * (the [[Opq.trainingSample]] practice, round-13) — the k-means
    * cost at √n-scaled nLists would otherwise be iters × n × nLists ×
    * dim. The sample is renumbered DENSELY before training:
    * [[initCentroids]]' stride seeding assumes a gap-free id space,
    * and a hash sample of an offset-planted corpus is anything but —
    * un-renumbered it seeds a fraction of nLists and Lloyd starts
    * crippled. Only the embeddings leave the renumber; centroid output
    * is id-free, so callers assign the FULL corpus against it as
    * always.
    */
  def trainCentroidsOnSample(data: DataFrame, nLists: Int, iters: Int = 3,
                             maxRows: Long = 20000L): DataFrame =
    trainCentroidsFromSample(
      Opq.trainingSample(data.select("vec_id", "embedding"), maxRows),
      nLists, iters)

  /** [[trainCentroidsOnSample]] against a PREBUILT sample — callers
    * that already materialized one (e.g. for codebook training) must
    * not re-scan the corpus to build it twice.
    */
  def trainCentroidsFromSample(sample: DataFrame, nLists: Int,
                               iters: Int = 3): DataFrame = {
    val dense = sample
      .select((row_number().over(Window.orderBy("vec_id")) - 1).cast("long")
        .as("vec_id"), col("embedding"))
      .localCheckpoint() // iters passes scan the renumbered sample, not re-sort it
    trainCentroids(dense, nLists, iters)
  }

  /** Driver-side mirror of [[trainCentroidsFromSample]] over a collected
    * bounded sample (the round-14 [[Opq.trainRotationLocal]] practice):
    * the dense renumber is the vec_id sort rank, the stride init and
    * the strict-first-min Lloyd assignment/mean-update/empty-list-drop
    * rules are [[initCentroids]]/[[trainCentroids]]' exactly, and zero
    * Spark jobs run inside the loop — the distributed alternation paid
    * ~iters×2 collect-jobs of fixed scheduling cost over a sample that
    * is bytes, not data. Returns (list_id, centroid) sorted by list.
    */
  private[similarity] def trainCentroidsLocal(s: Opq.LocalSample, nLists: Int,
                                              iters: Int): Array[(Int, Array[Double])] = {
    require(s.vecs.nonEmpty, "empty sample — no centroid init rows")
    // dense renumber: position in ascending-vec_id order
    val byId = s.ids.indices.sortBy(s.ids(_)).toArray
    val vecs = byId.map(s.vecs(_))
    val n = vecs.length.toLong
    val spacing = math.max(n / nLists, 1L)
    var cents: Array[(Int, Array[Double])] =
      Iterator.range(0, vecs.length)
        .filter(i => i % spacing == 0 && i < spacing * nLists)
        .map(i => ((i / spacing).toInt, vecs(i.toInt).clone()))
        .toArray
    val dim = vecs(0).length
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < vecs.length) {
        val v = vecs(i)
        var bestP = 0
        var bestD = Double.MaxValue
        var p = 0
        while (p < cents.length) {
          val c = cents(p)._2
          var d2 = 0.0
          var t = 0
          while (t < dim) { val d = v(t) - c(t); d2 += d * d; t += 1 }
          if (d2 < bestD) { bestD = d2; bestP = p }
          p += 1
        }
        val acc = sums(bestP)
        var t = 0
        while (t < dim) { acc(t) += v(t); t += 1 }
        counts(bestP) += 1
        i += 1
      }
      // empty lists DROP (trainCentroids rebuilds cent from the updated
      // rows only), keeping the id→position mapping by list_id sort
      cents = cents.indices.iterator
        .filter(counts(_) > 0)
        .map(p => (cents(p)._1, sums(p).map(_ / counts(p))))
        .toArray
        .sortBy(_._1)
    }
    cents
  }

  /** Nearest-centroid assignment: (vec_id, list_id). The centroids are
    * k×dim doubles — driver-local by construction — so the argmin is
    * ONE codegen expression over literal centroid arrays: a narrow map
    * with no crossJoin, no shuffle, and no per-vector window sort, at
    * any corpus size. (The earlier crossJoin+row_number formulation
    * shuffled |corpus|×k rows per call — per Lloyd iteration.)
    */
  def assign(data: DataFrame, centroids: DataFrame): DataFrame =
    assignWithVec(data, centroids).select("vec_id", "list_id")

  /** Assignment that keeps the embedding column in its output —
    * the centroid-update pass consumes (list_id, embedding) directly,
    * avoiding a corpus-wide re-join per k-means iteration.
    */
  def assignWithVec(data: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    data.select(col("vec_id"), col("embedding"),
      nearestListExpr(cents).as("list_id"))
      .select("vec_id", "list_id", "embedding")
  }

  /** Argmin-distance centroid id over `vec` as a literal-centroid
    * expression: the centroids are driver-local bytes, so the whole
    * argmin is ONE codegen projection — no crossJoin, no shuffle, no
    * per-vector window sort, at any corpus size. Ties go to the
    * smallest id (array_position returns the FIRST index of the min;
    * positions are ordered by id) — the same rule an
    * orderBy(dist, id) + row_number window would apply. Shared by the
    * IVF assignment and the nearest-centroid evaluator
    * (graft.svm.SvmQueries.centroidEvaluate).
    */
  private[graft] def nearestIdExpr(
      cents: Array[(Int, Seq[Double])], vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(cents.nonEmpty, "no centroids")
    // One referenced-constant codegen node (same first-min tie rule as
    // the array_position(array_min) formulation it replaces, whose
    // nLists·dim unrolled lit() tree dominated planning time); the id
    // table rides inside the expression — empty lists can disappear
    // between iterations, so position != id.
    VectorOps.nearestCentroid(cents.map(_._1), cents.map(_._2.toArray), vec)
  }

  private def nearestListExpr(cents: Array[(Int, Seq[Double])]): org.apache.spark.sql.Column =
    nearestIdExpr(cents, col("embedding"))

  /** IVF top-k: probes scan the inverted lists of their nProbe nearest
    * centroids; exact cosine within candidates.
    */
  def ivfTopK(spark: SparkSession, sfDir: String, k: Int = 5,
              probeEvery: Int = 50, nLists: Int = 16, nProbe: Int = 4,
              iters: Int = 3): DataFrame = {
    val data = emb(spark, sfDir)
    ivfTopKOf(data, Ann.gateProbes(data, probeEvery), k, nLists, nProbe, iters)
  }

  /** [[ivfTopK]] over an arbitrary corpus and probe frame. */
  def ivfTopKOf(data: DataFrame, probes: DataFrame, k: Int,
                nLists: Int, nProbe: Int, iters: Int = 3): DataFrame = {
    // trainCentroids returns a driver-local frame — no persist needed.
    val cent = trainCentroids(data, nLists, iters)
    val index = assign(data, cent) // inverted lists as (vec_id, list_id)
    queryIndex(cent, index, data.select("vec_id", "embedding"), probes, k, nProbe)
  }

  /** The QUERY side of the IVF scheme against a PREBUILT index: probes
    * scan their nProbe nearest lists, exact cosine within candidates.
    * Factored out of [[ivfTopKOf]] so callers with a frozen index
    * (e.g. [[IvfIncremental]] after a batch add) rank with the
    * identical pipeline — probe lists via broadcast centroid argmin,
    * ids-only through the list join, top-k by cosine desc / vec_id asc.
    */
  def queryIndex(cent: DataFrame, index: DataFrame, vectors: DataFrame,
                 probes: DataFrame, k: Int, nProbe: Int): DataFrame = {
    // nProbe nearest lists per probe
    val wp = Window.partitionBy("probe_id").orderBy(col("dist"), col("list_id"))
    val probeLists = probes
      .crossJoin(broadcast(cent))
      .withColumn("dist", VectorOps.distSq(col("probe_vec"), col("cvec")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select("probe_id", "list_id")
    // candidates = union of the probed lists; ids only through the join
    val w = Window.partitionBy("probe_id").orderBy(desc("cosine"), col("vec_id"))
    index
      .join(probeLists.hint("broadcast"), "list_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id")
      .join(vectors.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(probes), "probe_id")
      .withColumn("cosine", round(VectorOps.cosine(col("embedding"), col("probe_vec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("probe_id", "rk")
  }

  /** Bounded-probe IVF top-k: identical semantics to [[ivfTopKOf]]
    * (rows of the probe's nProbe nearest lists, self excluded, top-k
    * by cosine desc / vec_id asc, cosine rounded to 6 before ranking)
    * computed as ONE corpus scan through
    * [[graft.functions.KeyedTopKAgg]]: the probes and their probed
    * list sets ride along as referenced constants, so no candidate
    * pair ever crosses a shuffle and no sort window runs — the join
    * pipeline spent 17 s on the sf1 recall contract, this ~1 s. ONLY
    * for driver-bounded probe sets (the recall contracts cap theirs);
    * unbounded-probe callers use [[ivfTopKOf]].
    */
  def ivfTopKBounded(data: DataFrame, probes: DataFrame, k: Int,
                     nLists: Int, nProbe: Int, iters: Int = 3): DataFrame =
    queryIndexBounded(trainCentroids(data, nLists, iters), data, probes, k, nProbe)

  /** The bounded-probe query against a PREBUILT coarse quantizer —
    * [[ivfTopKBounded]] minus the training step, so frozen-index
    * callers ([[IvfIncremental]]) rank with the same one-scan
    * aggregate. The per-row list id is re-derived by the same
    * [[nearestIdExpr]] the index was built with (assignment is a pure
    * per-row function — spec-pinned — so scanning `vectors` with the
    * derived key IS scanning the stored inverted lists).
    */
  def queryIndexBounded(cent: DataFrame, vectors: DataFrame, probes: DataFrame,
                        k: Int, nProbe: Int): DataFrame = {
    val cents = cent.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    // nProbe nearest lists per probe — same pipeline as ivfTopKOf, just
    // collected (probes are bounded by contract)
    val wp = Window.partitionBy("probe_id").orderBy(col("dist"), col("list_id"))
    val plRows = probes
      .crossJoin(broadcast(cent))
      .withColumn("dist", VectorOps.distSq(col("probe_vec"), col("cvec")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select("probe_id", "list_id")
      .collect()
    val pRows = probes
      .select(col("probe_id"), transform(col("probe_vec"), x => x.cast("double")).as("pv"))
      .collect()
    val pids = pRows.map(_.getLong(0))
    val pvecs = pRows.map(_.getSeq[Double](1).toArray)
    val idx = pids.zipWithIndex.toMap
    val keyProbes = Array.fill(cents.map(_._1).max + 1)(Seq.newBuilder[Int])
    plRows.foreach(r => keyProbes(r.getInt(1)) += idx(r.getLong(0)))
    vectors
      .agg(graft.functions.GraftFunctions.keyed_topk(
        col("embedding"), col("vec_id"),
        array(nearestIdExpr(cents, col("embedding")).cast("int")),
        pids, pvecs, keyProbes.map(_.result().toArray), k).as("top"))
      .select(inline(col("top")))
      .orderBy("probe_id", "rk")
  }

  /** Oracle-verified IVF query: each probe's exact duplicate is planted
    * in the corpus ([[Ann.plantedEmbeddings]]); identical vectors share
    * the same nearest centroid, so the planted copy always lives in the
    * probe's first probed list and MUST come back as the top-1 neighbor
    * at cosine 1.0. The recall-vs-brute-force summary remains in
    * [[ivfSummary]].
    */
  def ivfPlantedTop1(spark: SparkSession, sfDir: String,
                     probeEvery: Int = 50, offset: Long = 1000000L,
                     nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val data = Ann.plantedEmbeddings(spark, sfDir, probeEvery, offset)
    val probes = Ann.gateProbes(emb(spark, sfDir), probeEvery)
    ivfTopKOf(data, probes, k = 1, nLists, nProbe)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"))
      .orderBy("probe_id")
  }

  /** Single-row IVF quality summary vs exact brute force (same shape as
    * [[Ann.lshSummary]]): one aggregation job.
    */
  def ivfSummary(spark: SparkSession, sfDir: String, k: Int = 5,
                 probeEvery: Int = 50, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val brute = Ann.bruteForceTopK(spark, sfDir, k, probeEvery)
      .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_brute"))
    val ivf = ivfTopK(spark, sfDir, k, probeEvery, nLists, nProbe)
      .select(col("probe_id"), col("neighbor_id"), lit(1).as("in_ivf"))
    brute.join(ivf, Seq("probe_id", "neighbor_id"), "full_outer")
      .agg(
        countDistinct(when(col("in_brute") === 1, col("probe_id"))).as("n_probes"),
        count(col("in_ivf")).as("n_ivf_results"),
        count(col("in_brute")).as("n_brute_results"),
        count(when(col("in_brute") === 1 && col("in_ivf") === 1, 1)).as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / greatest(col("n_brute_results"), lit(1L)), 4))
  }
}
