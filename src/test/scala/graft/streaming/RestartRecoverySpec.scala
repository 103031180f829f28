package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 hardening (round-10 verdict items 2 and 5):
  *
  *  - batch-id REPLAY idempotence of the chained-state fold: Spark's
  *    foreachBatch contract re-delivers a batch id after certain
  *    failures; an ADDITIVE fold (RateSpikeStream's hourly counts)
  *    double-counts unless the fold gates on the id. [[ChainedState
  *    .foldBatch]] skips the merge when `state-<id>` is committed —
  *    both branches (committed → skip; partial, no _SUCCESS → rewrite)
  *    are pinned here by driving foldBatch directly with repeated ids.
  *
  *  - RESTART recovery beyond DocStream's file-sink test: each stateful
  *    operator family (foreachBatch chained state: stream_topk,
  *    stream_merge; flatMapGroupsWithState: stream_user_stats) is
  *    stopped mid-feed and resumed against the same checkpoint; the
  *    recovered final state must equal the all-at-once batch answer —
  *    which fails BOTH if state is lost (undercount) and if committed
  *    offsets are replayed (double count).
  */
class RestartRecoverySpec extends SparkSpec {

  private def freshBase(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  // ------------------------------------------------------ replay idempotence

  test("foldBatch is idempotent under batch-id replay: the additive " +
    "rate-spike fold does not double-count a re-delivered batch") {
    val base = freshBase("replay")
    val stateRoot = base.resolve("state").toString
    val statePath = new java.util.concurrent.atomic.AtomicReference[String](
      s"$stateRoot/state-init")
    spark.range(0).selectExpr("id AS h", "id AS n")
      .write.mode("overwrite").parquet(statePath.get)
    val batch0 = spark.range(10).select((col("id") % 3).as("h"))

    ChainedState.foldBatch(spark, stateRoot, statePath,
      RateSpikeStream.hourlyAdd, batch0, 0L)
    val once = spark.read.parquet(s"$stateRoot/state-0")
      .collect().map(_.toSeq).toSet
    assert(once == Set(Seq(0L, 4L), Seq(1L, 3L), Seq(2L, 3L)),
      s"first fold must count the batch once: $once")

    // the replay: same id re-delivered after the state write committed.
    // statePath was already advanced to state-0 — a non-gated fold
    // would merge batch-0 INTO state-0 and double every count.
    ChainedState.foldBatch(spark, stateRoot, statePath,
      RateSpikeStream.hourlyAdd, batch0, 0L)
    val replayed = spark.read.parquet(s"$stateRoot/state-0")
      .collect().map(_.toSeq).toSet
    assert(replayed == once,
      s"replayed batch must be a no-op on committed state: $replayed vs $once")
    assert(statePath.get.endsWith("state-0"),
      "the pointer must still advance on a skipped replay")
  }

  test("a PARTIAL state dir (no _SUCCESS — crash mid-write) is rewritten, " +
    "not skipped as committed") {
    val base = freshBase("partial")
    val stateRoot = base.resolve("state").toString
    val statePath = new java.util.concurrent.atomic.AtomicReference[String](
      s"$stateRoot/state-init")
    spark.range(0).selectExpr("id AS h", "id AS n")
      .write.mode("overwrite").parquet(statePath.get)
    // plant a partial state-0: parquet data present, _SUCCESS missing
    val partial = new java.io.File(stateRoot, "state-0")
    spark.range(1).selectExpr("id AS h", "CAST(999 AS BIGINT) AS n")
      .write.mode("overwrite").parquet(partial.getPath)
    assert(new java.io.File(partial, "_SUCCESS").delete(),
      "spec setup: _SUCCESS must exist to be deleted")

    val batch0 = spark.range(10).select((col("id") % 3).as("h"))
    ChainedState.foldBatch(spark, stateRoot, statePath,
      RateSpikeStream.hourlyAdd, batch0, 0L)
    val rows = spark.read.parquet(partial.getPath).collect().map(_.toSeq).toSet
    assert(rows == Set(Seq(0L, 4L), Seq(1L, 3L), Seq(2L, 3L)),
      s"partial dir must be recomputed from state-init + batch, got $rows")
  }

  // ------------------------------------------------- chained-state restarts

  test("stream_topk recovers across a mid-feed restart: resume folds only " +
    "the new files onto carried leaderboard state") {
    val k = 3
    val feed = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_brand", "p_partkey", "p_retailprice")
    val half1 = feed.filter(col("p_partkey") % 2 === 0)
    val half2 = feed.filter(col("p_partkey") % 2 === 1)
    val init = feed.limit(0)

    val (_, stateRoot) = ChainedState.run(spark, "topk-restart", half1, 4,
      init, TopKStream.mergeFn(k))
    val base = new java.io.File(stateRoot).getParent
    val statesAfterHalf = new java.io.File(stateRoot).list().count(_.startsWith("state-"))

    // mid-feed: more files arrive, the job restarts on the same base
    half2.repartition(4).write.mode("append").parquet(s"$base/feed")
    val (state, _) = ChainedState.resume(spark, base, TopKStream.mergeFn(k))
    val statesAfterResume = new java.io.File(stateRoot).list().count(_.startsWith("state-"))
    assert(statesAfterResume > statesAfterHalf,
      "resume must fold NEW batches (ids continue past the first run's)")

    val got = TopKStream.topK(state, k)
      .select("p_brand", "p_partkey")
    val expect = TopKStream.topK(feed, k).select("p_brand", "p_partkey")
    assert(sameRows(got, expect),
      "recovered leaderboard must equal the batch top-k over the full feed")
  }

  test("stream_merge recovers across a mid-feed restart: latest-version-wins " +
    "state carries tombstones and versions through the checkpoint") {
    val base0 = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        lit(0L).as("version"), lit(false).as("is_delete"))
    val changes = MergeStream.changeFeed(spark, sf0001)
    val half1 = changes.filter(col("o_orderkey") % 2 === 0)
    val half2 = changes.filter(col("o_orderkey") % 2 === 1)

    val (_, stateRoot) = ChainedState.run(spark, "cdc-restart", half1, 4,
      base0, (st, b) => MergeStream.latestWins(st.unionByName(b)))
    val base = new java.io.File(stateRoot).getParent
    half2.repartition(4).write.mode("append").parquet(s"$base/feed")
    val (state, _) = ChainedState.resume(spark, base,
      (st, b) => MergeStream.latestWins(st.unionByName(b)))

    val got = state.filter(!col("is_delete"))
      .select("o_orderkey", "o_totalprice", "version")
    val expect = MergeStream.latestWins(base0.unionByName(changes))
      .filter(!col("is_delete"))
      .select("o_orderkey", "o_totalprice", "version")
    assert(sameRows(got, expect),
      "recovered CDC snapshot must equal the all-at-once batch merge")
  }

  // ---------------------------------------- flatMapGroupsWithState restart

  test("stream_user_stats recovers flatMapGroupsWithState state across a " +
    "mid-feed restart: per-user counters continue, not restart") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = freshBase("userstats").toString
    val feedDir = s"$base/feed"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    val events = graft.queries.Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts"))
    // split by ts parity: nearly every user has events in BOTH halves,
    // so lost state would undercount nearly every user
    val half1 = events.filter(col("ts") % 2 === 0)
    val half2 = events.filter(col("ts") % 2 === 1)

    half1.repartition(4).write.mode("overwrite").parquet(feedDir)
    val firstState = EventStream.runUserStatsResumable(spark, feedDir, ckpt, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    half2.repartition(4).write.mode("append").parquet(feedDir)
    val recovered = EventStream.runUserStatsResumable(spark, feedDir, ckpt, out)

    val expect = events.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      (floor(sum("value") * 100 + 0.5) / 100).as("total_value"),
      max("ts").as("last_seen"))
    assert(sameRows(recovered, expect),
      "recovered per-user stats must equal the batch aggregate over the " +
        "full feed — undercounts = lost state, overcounts = replayed offsets")
    // and the recovery genuinely CONTINUED counters: some user seen in
    // both halves must have final n_events strictly above its half-1 count
    val finalCounts = recovered.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalCounts.exists { case (u, n) =>
      firstState.get(u).exists(n1 => n1 > 0 && n > n1) },
      "at least one user's counter must continue past its pre-restart value")
  }
}
