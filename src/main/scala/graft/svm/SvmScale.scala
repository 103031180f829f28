package graft.svm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature scaling to [-1, 1] — the `svm-scale` step of the public
  * LibSVM toolchain (SURVEY.md §2a): RBF kernels are
  * distance-based, so a dimension with a 1000× larger range silently
  * dominates every exponent; LibSVM's practice guide (Hsu, Chang &
  * Lin) makes scaling step one of the workflow the reference's
  * drivers inherit.
  *
  * Scale shape: pass 1 computes per-dimension (min, max) —
  * `posexplode` then a 64-group aggregation that combines map-side, so
  * the shuffle carries one (dim, min, max) state per partition, not
  * elements. The 64 bounds come to the driver (k rows, the centroid
  * pattern) and pass 2 rescales each vector with a `transform` over
  * the bound ARRAYS AS ONE LITERAL each (two `lit` arrays indexed by
  * position — referenced constants, not 64 unrolled expression trees;
  * the ANN rounds measured unrolled-lit trees dominating analysis
  * time). Output is the scaled sample rows `vec_id % 50 = 0` — every
  * arithmetic step (cast, subtract, multiply, divide, round) runs in
  * the same IEEE order the oracle uses, so values match bit-for-bit.
  * Constant dimensions map to 0.0 (LibSVM emits the lower bound;
  * 0 keeps the contract symmetric and divide-by-zero-free).
  */
object SvmScale {

  def svmScale(spark: SparkSession, sfDir: String): DataFrame =
    scaleOf(spark.read.parquet(s"$sfDir/embeddings.parquet"))

  private[svm] def scaleOf(e: DataFrame): DataFrame = {
    val bounds = e
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val lo = array(bounds.map(b => lit(b._2)): _*)
    val hi = array(bounds.map(b => lit(b._3)): _*)

    e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"), round(col("x").cast("double"), 6).as("x"),
        round(
          when(element_at(hi, col("dim") + 1) === element_at(lo, col("dim") + 1), lit(0.0))
            .otherwise(
              (col("x").cast("double") - element_at(lo, col("dim") + 1)) * 2.0 /
                (element_at(hi, col("dim") + 1) - element_at(lo, col("dim") + 1)) - 1.0),
          6).as("scaled"))
      .orderBy("vec_id", "dim")
  }
}
