package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming per-group TOP-K maintenance — the streaming twin of
  * `q_topk_per_group` (the `stream_rate_spike` / `stream_funnel`
  * symmetry): a leaderboard kept current as rows arrive, without ever
  * recomputing over history.
  *
  * Top-k is MERGEABLE state (the bitmap-distinct lesson for ordered
  * selection): the top-k of A ∪ B is the top-k of (top-k of A) ∪
  * (top-k of B) — a batch can never push a row INTO the final top-k
  * that wasn't already in its own — so each micro-batch's per-brand
  * top-3 folds into a ≤ 3-rows-per-group keyed state via
  * `foreachBatch`, state volume ∝ groups·k forever, independent of
  * rows seen. Rows for one brand straddle micro-batch files
  * (round-robin feed split), so dropping carried state loses
  * leaderboard entries — the chunked spec pins ≥ 3 chained states and
  * batch convergence.
  *
  * The bounded replay must land exactly on the batch operator:
  * `q_topk_per_group`'s oracle SQL is this operator's oracle verbatim.
  * At 100 TB the state side is a (brand, k)-bounded table and each
  * micro-batch shuffles only its own top-k candidates.
  */
object TopKStream {

  /** State root of the most recent run in this JVM (spec hook). */
  @volatile var lastStateRoot: String = _

  private[streaming] def topK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), col("p_partkey"))
    df.withColumn("rk", dense_rank().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** The leaderboard fold (shared with the restart spec, which resumes
    * a half-fed run and must land on the batch answer).
    */
  private[streaming] def mergeFn(k: Int): (DataFrame, DataFrame) => DataFrame =
    (st, batch) => topK(st.unionByName(topK(batch, k)), k)

  def runTopKBounded(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val feed = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_brand", "p_partkey", "p_retailprice")
    val init = feed.limit(0)
    val (state, stateRoot) = ChainedState.run(spark, "topk", feed, 8, init,
      mergeFn(k))
    lastStateRoot = stateRoot
    // final presentation = the batch operator's exact output shape
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), col("p_partkey"))
    state.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= k)
      .select("p_brand", "p_partkey", "rk")
      .orderBy("p_brand", "rk", "p_partkey")
  }
}
