package graft.svm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed hyperparameter grid search with k-fold cross-validation
  * (SURVEY.md §2a): the model-selection step every LibSVM user runs
  * (`tools/grid.py` in the public LibSVM distribution) ahead of the
  * fixed (C, γ) the reference hard-codes (Midcascade.java:62-94 picks
  * C=1, γ=1/d with no selection step — this operator is where those
  * numbers come from in practice).
  *
  * Scale shape: model selection is embarrassingly parallel across the
  * GRID, not the data — each (C, γ, fold) cell is one task training on
  * the broadcast 300-point selection sample (fixed and sf-independent,
  * like `svm_model_io`'s pinned rings slice; selecting on a small
  * deterministic subsample is standard practice — LibSVM's own guide
  * recommends it). 3×3 grid × 5 folds = 45 independent SMO solves,
  * one per task, no shuffle at all until the 45-row rollup. For
  * selecting on data too big per cell, each cell becomes a cascade
  * (`svm_cascade_train`) — the grid parallelism composes with the
  * cascade's data parallelism.
  *
  * Folds come from `Ex.subset` (id-arithmetic, class-decorrelated);
  * training order is sorted by id, so every cell's solve is
  * bit-deterministic and the 9-row result is literal-pinnable: the
  * oracle freezes accuracy per cell, and `best` marks the
  * (errors, C, γ)-lexicographic minimum.
  */
object GridSearch {

  private val Folds = 5
  private val Cs = Seq(0.1, 1.0, 100.0)
  private val Gammas = Seq(0.001, 0.5, 50.0)

  /** Deterministic 15% label noise (the RingData.u hash formula on a
    * fresh salt): the clean rings are separable at EVERY grid cell, so
    * without noise the CV table is all-zeros and selection has no
    * signal. Noise makes the sweep discriminate (measured): γ=0.001 ≈
    * a near-constant kernel (rings are not linearly separable → 52%
    * error), the loose-C/extreme-γ cells land at 10-33%, and the
    * argmin (2/300) is unique — a solver or fold-plumbing change moves
    * the pinned table.
    */
  private def noisyLabel(e: Ex): Ex = {
    val h = (e.id * 2654435761L + 7L * 0x9E3779B97F4A7C15L) >>> 11
    if (h % 1000000L < 150000L) e.copy(label = 1 - e.label) else e
  }

  def gridSearch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sample = RingData.rings(spark, n = 300, k = Folds, dim = 4)
      .collect().sortBy(_.id).map(noisyLabel)
    val bc = spark.sparkContext.broadcast(sample)

    val cells = for { c <- Cs; g <- Gammas; f <- 0 until Folds } yield (c, g, f)
    val perFold = spark.createDataset(cells)
      .repartition(cells.size) // one solve per task — grid parallelism
      .map { case (c, g, f) =>
        val all = bc.value
        val train = all.filter(_.subset != f)
          .map(e => LabeledVec(e.label, e.features))
        val test = all.filter(_.subset == f)
          .map(e => LabeledVec(e.label, e.features))
        val model = Smo.train(train, Smo.Params(c = c, kernel = Kernel.Rbf(g)))
        (c, g, test.length.toLong, model.errorCount(test).toLong)
      }
      .toDF("c", "gamma", "n_test", "errs")

    val perCell = perFold.groupBy("c", "gamma")
      .agg(sum("n_test").as("n_test"), sum("errs").as("cv_errs"))
    // best = lexicographic (errors, C, γ) minimum — a one-row aggregate
    // broadcast back, not a global-order window.
    val best = perCell
      .agg(min(struct(col("cv_errs"), col("c"), col("gamma"))).as("b"))
    perCell.crossJoin(best)
      .withColumn("best",
        col("cv_errs") === col("b.cv_errs") &&
          col("c") === col("b.c") && col("gamma") === col("b.gamma"))
      .drop("b")
      .orderBy("c", "gamma")
  }
}
