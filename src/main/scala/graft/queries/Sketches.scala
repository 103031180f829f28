package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native DataSketches HLL surface (SURVEY.md §2b): `q_approx_distinct`
  * pins Spark's classic HyperLogLog++ aggregate; this operator pins the
  * Apache DataSketches tier (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`, Spark 3.5+) whose sketches are MERGEABLE
  * VALUES — the property that matters at 100 TB: per-partition (here
  * per-event-type) sketches are built in one scan, persist as bytes,
  * and any rollup (the all-types union) is a re-aggregation of
  * kilobyte states, never a rescan of the data.
  *
  * Contract: per event type, the lgK=14 estimate of distinct users
  * must sit within 2% of the exact count (lgK=14 keeps the standard
  * error ≈ 0.8%, so 2% is a real bound, not slack); the union row
  * re-aggregates the six per-type sketches. Sketch state is
  * max-per-register, so estimates are insertion-order- and
  * parallelism-independent — deterministic across engines' run plans.
  * The oracle recomputes only the exact counts (sketch internals are
  * engine-specific by nature — the q_approx_distinct discipline).
  */
object Sketches {

  def qHllSketch(spark: SparkSession, sfDir: String): DataFrame = {
    // loadEvents, not a raw read: legacy TIMESTAMP(NANOS) event data
    // fails parquet schema conversion without the nanosAsLong conf,
    // even though ts is never selected here.
    val events = Analytics.loadEvents(spark, sfDir)
    // localCheckpoint the |types|-row sketch table before fanning out:
    // it feeds both the per-type rows and the union row, and without
    // the cut the union branch would re-run the full events aggregation
    // unless exchange reuse happened to fire — the one-scan framing
    // made physical, not hoped-for (the Skyline collapse discipline).
    val perType = events
      .groupBy("event_type")
      .agg(
        hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
        countDistinct("user_id").as("n_exact"))
      .localCheckpoint()
    val union = perType.agg(hll_union_agg(col("sk")).as("sk"))
    // union-exact needs the raw data once (the oracle's side too); the
    // sketch union itself never rescans events.
    val unionExact = events.agg(countDistinct("user_id").as("n_exact"))
    val perTypeRows = perType.select(
      col("event_type").as("scope"),
      col("n_exact"),
      (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
        col("n_exact") * 0.02).as("approx_ok"))
    val unionRow = union.select(hll_sketch_estimate(col("sk")).as("est"))
      .crossJoin(unionExact)
      .select(lit("__union").as("scope"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.02).as("approx_ok"))
    perTypeRows.unionByName(unionRow).orderBy("scope")
  }

  /** Exact-distinct bitmaps over the dense user-id domain — the EXACT
    * tier next to [[qHllSketch]]'s approximate one (the ClickHouse /
    * Doris bitmap family): per-type bitsets built in one scan
    * (constant-size mergeable state — the shuffle carries one
    * ⌈maxId/8⌉-byte bitmap per group × partition, not every distinct
    * id), the all-types union row ORs the six bitmap VALUES without
    * rescanning events. The bitmap cardinality IS the output the
    * oracle's `count(DISTINCT)` must equal — exactness is the
    * contract, not a tolerance band. Dense-domain guard: ids outside
    * [0, maxId) fail loudly (roaring / re-densified dictionaries are
    * the public sparse-domain path).
    */
  def qBitmapDistinct(spark: SparkSession, sfDir: String,
                      maxId: Int = 1 << 20): DataFrame = {
    import graft.functions.GraftFunctions
    val events = Analytics.loadEvents(spark, sfDir)
    bitmapCensus(events.groupBy("event_type")
      .agg(GraftFunctions.bitmap_build(col("user_id"), maxId).as("bm")))
  }

  /** Sparse-domain exact-distinct bitmaps — the documented fallback
    * [[qBitmapDistinct]]'s dense guard points at, made real: ids
    * planted at ~2^40 offsets (`user_id · 2^40 + user_id mod 7` — an
    * injective map, so distinct counts are preserved) would blow the
    * dense bitset by 12 orders of magnitude; the guard trips loudly
    * (spec-pinned). The fix is DICTIONARY RE-DENSIFICATION: map the
    * observed id set onto a contiguous [0, n) index space, then run
    * the same constant-state bitmap machinery over the indexes.
    *
    * The index assignment deliberately avoids a GLOBAL sort (the
    * dense_rank formulation's pinch): two-level indexing — distinct
    * ids bucket by hash, rank WITHIN each bucket (partition-local
    * sort after one hash exchange), add broadcast per-bucket prefix
    * offsets (≤ `buckets` longs through the driver, the corpus_seqpack
    * discipline). idx = offset(bucket) + local_rank − 1 is contiguous
    * and deterministic; the census never depends on WHICH idx an id
    * gets, only that the map is injective into [0, n).
    *
    * Scale shape: one distinct shuffle builds the dictionary, one
    * id-keyed shuffle maps the fact, then the dense path's one-scan
    * bitmap aggregate. Past 2^31 distinct ids the dictionary itself
    * range-shards into per-shard bitmaps (same machinery, sharded
    * offsets); the strict `count(DISTINCT)`-equality oracle is
    * unchanged from the dense row.
    */
  def qBitmapSparse(spark: SparkSession, sfDir: String,
                    buckets: Int = 32,
                    shardCapacity: Long = Int.MaxValue.toLong): DataFrame = {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.expressions.Window
    require(shardCapacity > 0 && shardCapacity <= Int.MaxValue.toLong,
      s"q_bitmap_sparse: shardCapacity $shardCapacity must fit one bitmap's index space")
    val sparse = sparseIdEvents(spark, sfDir)

    // localCheckpoint: the distinct-id set feeds BOTH the bucket-count
    // collect and the dictionary build — without the cut the events
    // scan + distinct exchange would run twice (the qDecileLiftApprox
    // multi-scan discipline; makes the "one distinct shuffle" claim
    // physically true).
    val ids = sparse.select("sid").distinct()
      .withColumn("b", pmod(hash(col("sid")), lit(buckets)))
      .localCheckpoint()
    val counts = ids.groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy("b").collect().map(r => r.getInt(0) -> r.getLong(1))
    val n = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
    val offsetsDf = spark.createDataFrame(
      counts.zip(offsets.init.map(_._2)).map { case ((b, _), off) => (b, off) }.toSeq)
      .toDF("b", "off")
    val dict = ids
      .withColumn("rn", row_number().over(Window.partitionBy("b").orderBy("sid")))
      .join(broadcast(offsetsDf), "b")
      .select(col("sid"), (col("off") + col("rn") - 1).as("idx"))
    val indexed = sparse.join(dict, "sid")

    if (n <= shardCapacity)
      // one bitmap covers the whole re-densified domain: the dense
      // path's one-scan aggregate, unchanged
      bitmapCensus(indexed
        .groupBy("event_type")
        .agg(GraftFunctions.bitmap_build(col("idx"), n.toInt).as("bm")))
    else
      // the >capacity tier (at the default capacity: >2^31 distinct
      // ids): RANGE-SHARD the contiguous index space — shard =
      // idx / capacity, each shard its own constant-size bitmap
      bitmapShardedCensus(indexed, shardCapacity)
  }

  /** The range-sharded census: per (group, shard) bitmaps over the
    * shard-local index, cardinalities SUMMED across shards — exact
    * because the dictionary index space is contiguous and the shards
    * partition it (an id lands in exactly one shard, so per-shard
    * cardinalities are disjoint). The union row ORs bitmaps WITHIN a
    * shard across groups (the only sound direction — OR across shards
    * would conflate different ids that share a local index), then sums
    * the per-shard union cardinalities. Scale shape: identical to the
    * dense path with `shards`× more (constant-size) aggregate states;
    * the shuffle still carries bitmaps, never ids.
    */
  private[graft] def bitmapShardedCensus(indexed: DataFrame,
                                         shardCapacity: Long): DataFrame = {
    import graft.functions.GraftFunctions
    // `div`, not `/`: Spark's `/` on longs is IEEE double division then
    // truncation — exact only below 2^53; integer floor division makes
    // shard = idx div capacity hold by construction at ANY index scale
    // (this tier exists precisely for >2^31 index spaces).
    val sharded = indexed
      .withColumn("shard", expr(s"idx div ${shardCapacity}L").cast("int"))
      .withColumn("local", expr(s"idx % ${shardCapacity}L").cast("long"))
    val perShard = sharded
      .groupBy("event_type", "shard")
      .agg(GraftFunctions.bitmap_build(col("local"), shardCapacity.toInt).as("bm"))
      // feeds BOTH the per-type rollup and the union row: cut the
      // lineage so the fact join + bitmap aggregation runs once
      .localCheckpoint()
    val perTypeRows = perShard
      .select(col("event_type"), GraftFunctions.bitmap_card(col("bm")).as("c"))
      .groupBy(col("event_type").as("scope"))
      .agg(sum("c").as("n_distinct"))
    val unionRow = perShard
      .groupBy("shard")
      .agg(GraftFunctions.bitmap_or_count(col("bm")).as("c"))
      .agg(sum("c").as("n_distinct"))
      .select(lit("__union").as("scope"), col("n_distinct"))
    perTypeRows.unionByName(unionRow).orderBy("scope")
  }

  /** The sparse plant: user ids spread to ~2^40 offsets, injectively.
    * TEST FIXTURE bound: user_id·2^40 stays long-safe only below
    * user_id < 2^23 (every test SF is ≤ ~10^5, three orders inside) —
    * the OPERATOR itself takes arbitrary long ids; the dictionary
    * path has no domain constraint at all, only the plant does.
    */
  private[graft] def sparseIdEvents(spark: SparkSession, sfDir: String): DataFrame =
    Analytics.loadEvents(spark, sfDir)
      .select(col("event_type"),
        (col("user_id") * lit(1099511627776L) + pmod(col("user_id"), lit(7)))
          .as("sid"))

  /** Census of an (event_type, bm) bitmap table: per-type cardinality
    * rows + the `__union` OR-rollup row — shared with the streaming
    * twin, whose carried state has the same shape.
    */
  private[graft] def bitmapCensus(bitmaps: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions
    val perTypeRows = bitmaps.select(
      col("event_type").as("scope"),
      GraftFunctions.bitmap_card(col("bm")).as("n_distinct"))
    val unionRow = bitmaps
      .agg(GraftFunctions.bitmap_or_count(col("bm")).as("n_distinct"))
      .select(lit("__union").as("scope"), col("n_distinct"))
    perTypeRows.unionByName(unionRow).orderBy("scope")
  }
}
