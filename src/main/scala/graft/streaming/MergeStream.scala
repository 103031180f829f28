package graft.streaming

import graft.queries.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the streaming twin of
  * [[graft.queries.Merge.qMergeUpsert]]: the change feed arrives as
  * files (one per micro-batch), and `foreachBatch` reconciles each
  * batch into a keyed snapshot state with latest-version-wins
  * semantics. Tombstones are KEPT in the state (a tombstone must
  * out-rank a lower-version row that arrives in a LATER batch) and
  * filtered only in the final census.
  *
  * The feed adds a version-2 re-update wave on top of the batch
  * operator's change classes, and the merge is version-driven, hence
  * ORDER-INDEPENDENT: whatever file order the source lists, the final
  * state is the same — which is exactly what makes the pattern safe
  * under out-of-order CDC delivery at 100 TB. Cross-batch statefulness
  * is load-bearing: dropping the carried state between micro-batches
  * loses every class that arrived in an earlier file.
  *
  * State shape at scale: the snapshot is re-keyed parquet; each
  * micro-batch costs one key-shuffle of (state ∪ batch) — at 100 TB
  * the state side would be bucketed on the key so only the batch
  * shuffles; the reconciliation operator itself is unchanged.
  */
object MergeStream {

  /** State root of the most recent [[runMergeBounded]] in this JVM —
    * diagnostic hook so the spec can assert the run actually chained
    * multiple micro-batch states now that the root is per-run (nonce'd)
    * rather than derivable from (user, sfDir).
    */
  @volatile var lastStateRoot: String = _

  /** Batch change classes + a version-2 re-update of the updated keys
    * (stream-only: proves per-key reconciliation ACROSS micro-batches).
    */
  def changeFeed(spark: SparkSession, sfDir: String): DataFrame = {
    val wave2 = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") % 1000 === 3)
      .select(col("o_orderkey"), (col("o_totalprice") + 2000).as("o_totalprice"),
        lit(2L).as("version"), lit(false).as("is_delete"))
    Merge.changeBatch(spark, sfDir).unionByName(wave2)
  }

  /** Latest-version-wins reconciliation; tombstones stay in state.
    * Package-visible: the restart spec folds with the operator's own
    * reconciliation, not a spec re-implementation.
    */
  private[streaming] def latestWins(all: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderkey").orderBy(col("version").desc)
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Runs the bounded CDC stream and returns the final state census —
    * must equal the all-changes-at-once batch merge (the oracle).
    */
  def runMergeBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        lit(0L).as("version"), lit(false).as("is_delete"))
    val (state, stateRoot) = ChainedState.run(spark, "cdc",
      changeFeed(spark, sfDir), 4, base,
      (st, batch) => latestWins(st.unionByName(batch)))
    lastStateRoot = stateRoot
    state
      .filter(!col("is_delete"))
      .select("o_orderkey", "o_totalprice", "version")
      .orderBy("o_orderkey")
  }
}
