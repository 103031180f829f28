package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q1 pricing summary: aggregates reconcile with a direct recount") {
    val rows = Analytics.q1Agg(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalOrders = rows.map(_.getAs[Long]("count_order")).sum
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-01")).count()
    assert(totalOrders == direct)
  }

  test("q3: top-10 revenue ranking is descending and limited") {
    val rows = Analytics.q3Join(spark, sf0001).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5: every (region, nation) of active customers appears once") {
    val rows = Analytics.q5MultiJoin(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("semi + anti partition the customer table exactly") {
    val rows = Analytics.qSemiAnti(spark, sf0001).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n")).toMap
    val total = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(rows("with_orders") + rows("without_orders") == total)
  }

  test("window ranking keeps at most 2 orders per customer") {
    val rows = Analytics.qWindow(spark, sf0001).collect()
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 2))
    assert(rows.forall(r => r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 2))
  }

  test("rollup emits grand total + per-status subtotals that reconcile") {
    val rows = Analytics.qRollup(spark, sf0001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val leafN = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getAs[Long]("n")).sum
    assert(grand(0).getAs[Long]("n") == leafN)
  }

  test("grouping sets: marginals + grand total only, no cross cells") {
    val rows = Analytics.qGroupingSets(spark, sf0001).collect()
    // no (status, priority) cross cells in this set list
    assert(!rows.exists(r => !r.isNullAt(0) && !r.isNullAt(1)))
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val statusN = rows.filter(r => !r.isNullAt(0)).map(_.getAs[Long]("n")).sum
    val prioN = rows.filter(r => !r.isNullAt(1)).map(_.getAs[Long]("n")).sum
    // each marginal partitions the same order set
    assert(statusN == grand(0).getAs[Long]("n"))
    assert(prioN == grand(0).getAs[Long]("n"))
  }

  test("sessionization: session counts are positive and bounded by events") {
    val rows = Analytics.qSessionize(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalEvents = Analytics.loadEvents(spark, sf0001).count()
    val sessions = rows.map(_.getAs[Long]("n_sessions")).sum
    assert(sessions >= rows.length) // >= 1 session per user
    assert(sessions <= totalEvents) // <= 1 session per event
  }

  test("percentiles are ordered: min <= p50 <= p90 <= p99 <= max") {
    val r = Analytics.qPercentiles(spark, sf0001).collect()(0)
    val Seq(p50, p90, p99, mn, mx) =
      Seq("p50", "p90", "p99", "pmin", "pmax").map(r.getAs[Double])
    assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
  }

  test("top-k per group: dense_rank caps at 3 per brand") {
    val rows = Analytics.qTopKPerGroup(spark, sf0001).collect()
    rows.groupBy(_.getAs[String]("p_brand")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rk")).forall(_ <= 3))
    }
  }

  test("pivot: per-priority status totals reconcile with the plain rollup") {
    val pivoted = Analytics.qPivot(spark, sf0001).collect()
    assert(pivoted.length == 5) // 5 priorities
    val direct = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("total"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pivoted.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      Seq("F" -> "total_f", "O" -> "total_o", "P" -> "total_p").foreach { case (s, c) =>
        val expected = direct.get(p -> s)
        val got = if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Double](c))
        assert(got == expected, s"pivot cell ($p, $s)")
      }
    }
  }

  test("moving average: singleton frames equal the price itself") {
    val rows = Analytics.qMovingAvg(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")) -> r.getAs[Double]("mavg"))
      .toMap
    assert(rows.nonEmpty)
    // the DATE-first order of each customer has a frame of exactly itself
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getAs[java.time.LocalDateTime](3)))
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_ isBefore _)
    orders.groupBy(_._1).values.foreach { g =>
      val (ck, ok, price, _) = g.minBy(o => (o._4, o._2))
      assert(math.abs(rows((ck, ok)) - math.floor(price * 100 + 0.5) / 100) < 1e-9,
        s"customer $ck first order $ok")
    }
  }

  test("set ops: intersect/except counts partition the per-status customer sets") {
    val m = Analytics.qSetOps(spark, sf0001).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n")).toMap
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val nF = orders.filter(col("o_orderstatus") === "F").select("o_custkey").distinct().count()
    val nO = orders.filter(col("o_orderstatus") === "O").select("o_custkey").distinct().count()
    assert(m("both_f_and_o") + m("f_only") == nF)
    assert(m("both_f_and_o") + m("o_only") == nO)
  }

  test("skew histogram: key and row totals reconcile with the table") {
    val rows = Analytics.qSkewHistogram(spark, sf0001).collect()
    val ev = Analytics.loadEvents(spark, sf0001)
    assert(rows.map(_.getAs[Long]("n_keys")).sum == ev.select("user_id").distinct().count())
    assert(rows.map(_.getAs[Long]("n_rows")).sum == ev.count())
    // each bucket's max count fits the bucket's [2^(b-1), 2^b) range
    rows.foreach { r =>
      val b = r.getAs[Int]("log2_bucket")
      val mx = r.getAs[Long]("max_cnt")
      assert(mx >= (1L << (b - 1)) && mx < (1L << b), s"bucket $b max $mx")
    }
  }

  test("approx distinct: sketch lands within the pinned 5% of exact") {
    val rows = Analytics.qApproxDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")),
      "HLL++ at rsd 2% must stay within 5% of the exact distinct count")
  }

  test("approx percentile sketch lands inside the exact [p49, p51] band") {
    val r = Analytics.qApproxPercentile(spark, sf0001).collect()(0)
    assert(r.getAs[Boolean]("approx_ok"),
      "GK sketch at accuracy 10000 must land within the exact p49-p51 band")
    assert(r.getAs[Double]("exact_p50") > 0)
  }

  test("json extraction parses every well-formed payload; malformed degrades to null") {
    val rows = Analytics.qJsonExtract(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // this corpus is fully well-formed: nothing silently dropped
    rows.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("n_parsed")))
    // PERMISSIVE contract on malformed input: null, not an exception
    import spark.implicits._
    val parsed = Seq("""{"k": 7}""", "not json", """{"k": "x"}""").toDF("props")
      .select(from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("k")).collect()
    assert(parsed.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq ==
      Seq(Some(7), None, None))
  }

  test("range join: bucketized equi-join equals the naive inequality join") {
    val got = Analytics.qRangeJoin(spark, sf0001).collect()
      .map(r => r.getAs[Long]("window_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    val ev = Analytics.loadEvents(spark, sf0001)
      .select(col("event_id"), col("value"), unix_micros(col("ts")).as("t"))
    val windows = ev.orderBy(desc("value"), asc("event_id")).limit(20)
      .select(col("event_id").as("window_id"), (col("t") - 600000000L).as("ws"),
        (col("t") + 600000000L).as("we"))
    val naive = ev.join(windows, col("t") >= col("ws") && col("t") < col("we"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v")).collect()
      .map(r => r.getAs[Long]("window_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("v"))).toMap
    assert(got == naive, "bucketization must be invisible in the result")
    // every window catches at least its own anchor event
    assert(got.values.forall(_._1 >= 1) && got.size == 20)
  }

  test("unpivot round-trips the pivot back to the direct long-form aggregation") {
    val melted = Analytics.qUnpivot(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val direct = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("total")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(melted == direct)
    // the melt itself is shuffle-free: exactly the one exchange the
    // pivot's aggregation needs, none added by unpivot's Expand
    val plan = Analytics.qUnpivot(spark, sf0001).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    val pivotExchanges = "Exchange".r.findAllIn(
      Analytics.qPivot(spark, sf0001).queryExecution.executedPlan.toString).size
    assert(exchanges <= pivotExchanges + 1, // +1: the final orderBy range exchange
      s"unpivot must not add a data shuffle ($pivotExchanges -> $exchanges)")
  }
}
