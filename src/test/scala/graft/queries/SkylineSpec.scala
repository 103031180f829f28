package graft.queries

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, Double, Long)]): Set[(Long, Double, Long)] =
    rows.filterNot { case (_, p, s) =>
      rows.exists { case (_, p2, s2) =>
        p2 >= p && s2 >= s && (p2 > p || s2 > s)
      }
    }.toSet

  test("q_skyline equals the brute-force pareto frontier on sf0.01 part") {
    val all = spark.read.parquet(s"$sf001/part.parquet")
      .selectExpr("p_partkey", "p_retailprice", "CAST(p_size AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val got = Skyline.qSkyline(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSet == brute(all), "frontier membership mismatch")
    // ordering contract: price desc, then partkey
    assert(got.sortBy(t => (-t._2, t._1)).toSeq == got.toSeq)
    // a frontier exists and is a strict subset on any non-degenerate table
    assert(got.nonEmpty && got.length < all.length)
  }

  test("tie semantics: equal-(price,size) twins kept, strict dominators drop the rest") {
    import spark.implicits._
    // (1) twins at (10.0, 5) — both survive (no strict axis);
    // (2) (10.0, 4) — dominated by same-price larger size;
    // (3) (9.0, 5) — dominated by equal-size higher price;
    // (4) (8.0, 9) — frontier (best size);
    // (5) (11.0, 1) — frontier (best price).
    val rows = Seq(
      (1L, 10.0, 5L), (2L, 10.0, 5L), (3L, 10.0, 4L),
      (4L, 9.0, 5L), (5L, 8.0, 9L), (6L, 11.0, 1L))
    val df = rows.toDF("p_partkey", "price", "size")
    val got = Skyline.frontierOf(spark, df).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == brute(rows))
    assert(got.map(_._1) == Set(1L, 2L, 5L, 6L))
  }

  test("plan has no quadratic join: no cartesian/nested-loop, window partitioned by bucket") {
    val plan = Skyline.qSkyline(spark, sf001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "skyline must not cross-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "skyline must not nested-loop")
    // the dominance sweep's window is partitioned (parallel), not global
    assert(plan.contains("windowspecdefinition(bucket"),
      "the dominance-sweep window must be partitioned by bucket, not global")
  }
}
