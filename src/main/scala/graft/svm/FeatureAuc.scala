package graft.svm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-dimension univariate AUC (SURVEY.md §2a adjacent — model/eval
  * metrics): how well each embedding dimension alone separates class 0
  * from the rest, i.e. ROC-AUC of the raw feature as a score — the
  * standard feature-screening pass before training.
  *
  * Exact by construction (the repo's transcendental-free oracle rule):
  * AUC is computed by the Mann-Whitney rank formula with MIDRANKS for
  * ties — ranks are integers, a tie group's midrank is (min+max)/2
  * (always .0 or .5, exactly representable), the rank sum stays far
  * below 2^52 so float addition never rounds, and the final
  * (R₊ − n₊(n₊+1)/2) / (n₊·n₋) is ONE correctly-rounded IEEE division
  * — bit-identical in any engine. No sort order leaks into the result:
  * midranks are tie-group invariants.
  *
  * Plan shape: posexplode → ONE exchange on the dimension id; the
  * rank window (i), the midrank window (i, score) and the final
  * aggregate all cluster on i so they reuse it. At 100 TB the
  * per-dimension global sort inside the window is the cost — the
  * scale path is range-partitioning (i, score) and offsetting ranks
  * per range, the same two-pass trick as any distributed ranking; the
  * formula is unchanged.
  */
object FeatureAuc {

  private val Dims = 8 // screen the first 8 dimensions

  def featureAuc(spark: SparkSession, sfDir: String): DataFrame = {
    val byDim = Window.partitionBy("i").orderBy("v", "vec_id")
    val byTie = Window.partitionBy("i", "v")
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), (col("label") === 0).as("pos"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .filter(col("i") < Dims)
      .select(col("vec_id"), col("pos"), col("i").cast("long").as("i"),
        col("x").cast("double").as("v"))
      .withColumn("rn", row_number().over(byDim))
      .withColumn("midrank", avg("rn").over(byTie))
      .groupBy("i")
      .agg(
        sum(when(col("pos"), col("midrank"))).as("rpos"),
        count(when(col("pos"), lit(1))).as("n_pos"),
        count(when(!col("pos"), lit(1))).as("n_neg"))
      .select(col("i"),
        ((col("rpos") - col("n_pos") * (col("n_pos") + 1) / 2) /
          (col("n_pos") * col("n_neg"))).as("auc"),
        col("n_pos"), col("n_neg"))
      .orderBy("i")
  }
}
