package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapSparseSpec extends SparkSpec {

  test("the dense path's guard TRIPS on the sparse plant — loudly, not wrong") {
    import graft.functions.GraftFunctions
    val ex = intercept[Exception] {
      Sketches.sparseIdEvents(spark, sf0001)
        .groupBy("event_type")
        .agg(GraftFunctions.bitmap_build(col("sid"), 1 << 20).as("bm"))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(e => Option(e.getMessage).exists(_.contains("outside the dense domain"))),
      s"guard must name the dense-domain violation, got: $ex")
  }

  test("re-densified census equals exact count(DISTINCT) per type and union") {
    val out = Sketches.qBitmapSparse(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sparse = Sketches.sparseIdEvents(spark, sf0001)
    val perType = sparse.groupBy("event_type")
      .agg(countDistinct("sid").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val union = sparse.agg(countDistinct("sid")).head().getLong(0)
    assert(out == perType + ("__union" -> union),
      s"bitmap census $out must equal exact distincts ${perType + ("__union" -> union)}")
  }

  test("the planted ids actually live at ~2^40 offsets (the plant is honest)") {
    val mx = Sketches.sparseIdEvents(spark, sf0001).agg(max("sid")).head().getLong(0)
    assert(mx > (1L << 40), s"max sparse id $mx must exceed 2^40")
  }

  test("the RANGE-SHARDED tier (>capacity distinct ids) answers exactly: " +
    "forced shards partition the index space, per-shard cardinalities sum " +
    "to the same strict counts as the single-bitmap path (round-11 " +
    "verdict #5)") {
    val sparse = Sketches.sparseIdEvents(spark, sf0001)
    val n = sparse.select("sid").distinct().count()
    val capacity = 4L
    assert(n > capacity, s"fixture must exceed the shard capacity ($n vs $capacity)")
    val sharded = Sketches.qBitmapSparse(spark, sf0001, shardCapacity = capacity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = Sketches.qBitmapSparse(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sharded == single,
      s"sharded census $sharded must equal the single-bitmap census $single")
    val union = sparse.agg(countDistinct("sid")).head().getLong(0)
    assert(sharded("__union") == union,
      "the within-shard OR + cross-shard sum must stay exact")
    // at capacity 4 with n >= 8 ids the path provably ran >= 2 shards
    assert((n + capacity - 1) / capacity >= 2)
  }

  test("plan: no global sort — the dictionary ranks within hash buckets " +
    "(no rangepartitioning exchange anywhere)") {
    val p = Sketches.qBitmapSparse(spark, sf0001).queryExecution.executedPlan.toString
    // the only range exchange allowed is the ≤7-row census orderBy(scope)
    assert(!p.contains("rangepartitioning(sid"),
      s"index assignment must not globally sort the id space:\n$p")
  }
}
