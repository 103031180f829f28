package graft.streaming

import graft.queries.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental APPROXIMATE distinct maintenance — the sketch twin of
  * [[BitmapStream]] and the streaming twin of `q_hll_sketch`: a
  * running per-group `approx count(DISTINCT)` is maintainable because
  * HLL sketches are a commutative monoid under union — each
  * micro-batch builds its own per-type sketches (`hll_sketch_agg`)
  * and the carried state is `hll_union_agg(state ∪ batch)`, a
  * KILOBYTE-sized merge per group regardless of history. Where the
  * bitmap twin buys exactness at dense-domain cost (|domain|/8 bytes
  * per group), this is the state an unbounded-domain 100 TB stream
  * can actually carry forever.
  *
  * The contract mirrors `q_hll_sketch`: the stream-maintained sketch
  * estimate must land within 2% of the exact census for every group
  * AND for the union-of-groups rollup (the union row is computed by
  * merging the FINAL per-group states — no rescan of the feed), and
  * the chained-state replay ([[ChainedState]]) pins that state was
  * carried across micro-batches, not recomputed.
  */
object HllStream {

  @volatile var lastStateRoot: String = _

  def runHllBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val feed = Analytics.loadEvents(spark, sfDir).select("event_type", "user_id")
    val init = spark.range(0).select(col("id").cast("string").as("event_type"),
      lit(Array.emptyByteArray).as("sk"))
    // census exact side comes from the STATIC table — independent of
    // the replay until the band join, so both run as concurrent jobs
    // (guide §2.6): the exact countDistinct backfills executors the
    // replay's single-file micro-batches leave idle. Computations
    // unchanged on both legs.
    val events = Analytics.loadEvents(spark, sfDir)
    val ((state, stateRoot), (exact, nExactTotal)) = graft.util.Par.par2(
      ChainedState.run(spark, "hllstream", feed, 8, init,
        (st, batch) => st
          .unionByName(batch.groupBy("event_type")
            .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk")))
          .groupBy("event_type")
          .agg(hll_union_agg(col("sk")).as("sk"))),
      (events.groupBy(col("event_type").as("scope"))
        .agg(countDistinct("user_id").as("n_exact")).localCheckpoint(),
        events.agg(countDistinct("user_id").as("n_exact")).localCheckpoint()))
    lastStateRoot = stateRoot
    val st = state.localCheckpoint()
    val perType = st
      .select(col("event_type").as("scope"), hll_sketch_estimate(col("sk")).as("est"))
      .join(exact, Seq("scope"))
      .select(col("scope"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.02).as("approx_ok"))
    val unionRow = st.agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk")).as("est"))
      .crossJoin(nExactTotal)
      .select(lit("__union").as("scope"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.02).as("approx_ok"))
    perType.unionByName(unionRow).orderBy("scope")
  }
}
