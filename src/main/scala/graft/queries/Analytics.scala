package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytics query surface (SURVEY.md §2b).
  *
  * Every query is pure DataFrame API — declarative plans so Catalyst
  * performs predicate pushdown, column pruning, join reordering and AQE
  * re-planning. Small dimension tables are explicitly `broadcast()`ed;
  * aggregations rely on partial (map-side) aggregation. Doubles in
  * outputs are rounded so the DuckDB oracle hash-compares cleanly.
  */
object Analytics {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table's `ts` has shipped under three physical parquet
    * types across driver generations, so the loader normalizes by
    * schema instead of assuming one:
    *   - TIMESTAMP(NANOS): readable only as long nanos via the legacy
    *     flag; converted with integer division (`/ 1000` in double
    *     would lose precision above 2^53 ns; truncation matches
    *     DuckDB's ns→us cast).
    *   - TIMESTAMP_NTZ micros (current driver data, and GenScale's sf1
    *     re-emission — Spark cannot WRITE nanos): cast to TIMESTAMP.
    *     Every entry point (Verify, specs, Bench) pins the session
    *     time zone to UTC, so the cast is a pure reinterpretation and
    *     matches what DuckDB computes on the same naive values.
    *   - TIMESTAMP: already the target type.
    * All three land on identical micros-precision UTC instants, so
    * every event-time oracle is sf- and generation-independent.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Exact integer CENTS of a 2-decimal money double. The stored double
    * is the nearest binary64 of c/100 with error far below 0.005, so
    * `floor(x*100 + 0.5)` recovers c exactly — one IEEE
    * multiply+add+floor, bit-identical in every engine (Spark `floor`
    * on a double already returns BIGINT).
    */
  private[graft] def cents(x: Column): Column = floor(x * 100 + 0.5)

  /** Deterministic money sum: convert each 2-decimal term to exact
    * BIGINT cents, sum as integers. A double sum's last cents depend on
    * partition/merge order — at sf1 two revenue rows diverged from the
    * single-threaded oracle by exactly one cent — while the integer sum
    * is exact, associative, and reproducible at ANY parallelism. An
    * earlier round bought the same determinism with per-term
    * DECIMAL(30,10) casts; those cost ~2× on the wide aggregations
    * (BASELINE.md q1_agg/q_rollup) where BIGINT adds are near-free.
    * Int64 headroom: max money ~5·10^7 cents ⇒ ~1.8·10^11 rows per
    * group before overflow (ANSI mode fails loudly, never wraps); past
    * that, sum DECIMAL(38,0) cents.
    */
  private[graft] def moneySum(x: Column): Column = sum(cents(x)) / 100.0

  /** price·(1−discount) revenue summed exactly in integer arithmetic:
    * cents(price) and the discount percentage are both exact small
    * integers, so each term `cents · (100 − pct)` is the exact revenue
    * in 10⁻⁴ dollars. Summed as BIGINT; one final HALF_UP to cents via
    * `(S+50) div 100` (S ≥ 0), then a single exact-integer/100.0 IEEE
    * division. Per-term ≤ ~5·10^9 ⇒ ~1.8·10^9 rows per group of int64
    * headroom at max price — ANSI fails loudly past that; DECIMAL(38,0)
    * is the documented escape at that scale.
    */
  private[graft] def moneyRevenueSum(price: Column, discount: Column): Column =
    centiMoney(sum(cents(price) * (lit(100L) - cents(discount))))

  /** price·discount (the discounted-amount shape, q6) in the same exact
    * 10⁻⁴-dollar units as [[moneyRevenueSum]]. */
  private[graft] def moneyDiscSum(price: Column, discount: Column): Column =
    centiMoney(sum(cents(price) * cents(discount)))

  /** 10⁻⁴-dollar BIGINT total → dollars: HALF_UP to cents in integer
    * arithmetic, one final exact division. */
  private def centiMoney(s: Column): Column =
    call_function("div", s + lit(50L), lit(100L)) / 100.0

  /** TPC-H Q1-style pricing summary. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: top unshipped-revenue orders; dims broadcast. */
  def q3Join(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = t(spark, sfDir, "orders")
    val lineitem = t(spark, sfDir, "lineitem")
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation across a 5-way join. */
  def q5MultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val region = t(spark, sfDir, "region")
    val nation = t(spark, sfDir, "nation")
    val customer = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders")
    val lineitem = t(spark, sfDir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q6-style selective filter + agg — predicate-pushdown showcase. */
  def q6Filter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(moneyDiscSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Window functions: rank each customer's orders by totalprice. */
  def qWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select("o_custkey", "o_orderkey", "rk")
      .orderBy("o_custkey", "rk")
  }

  /** Rollup aggregation over orders. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(moneySum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Cube aggregation over orders — all 2^2 grouping sets in one pass. */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(moneySum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Explicit GROUPING SETS — the shape rollup/cube can't express:
    * the two one-dimension marginals plus the grand total, WITHOUT the
    * (status, priority) cross cells. One pass, one shuffle (the sets
    * expand map-side exactly like rollup); at scale this is the cheap
    * way to get k independent marginal reports from one scan instead
    * of k separate aggregations.
    */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(moneySum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Pivot: order totals as a (priority × status) matrix — Spark's
    * pivot with an EXPLICIT value list (omit it and the planner runs an
    * extra distinct-collect job over 100 TB just to learn the columns).
    * One shuffle, pivoted aggregates computed map-side like any agg.
    * Cells sum with [[moneySum]]'s exact BIGINT cents — a double sum's
    * last cent is partition-order-dependent once cells reach ~100k
    * terms (sf1), the same failure mode the rest of the money family
    * already eliminated.
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(moneySum(col("o_totalprice")))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy("o_orderpriority")

  /** UNPIVOT/melt — the inverse of [[qPivot]] and the other half of the
    * reshape surface: the wide (priority × status) totals matrix melts
    * back to long (priority, status, total) rows via the native
    * `Dataset.unpivot` (Spark's melt — a per-row Expand, no shuffle
    * beyond the pivot that built the input). Round-tripping the
    * engine's own pivot output makes the contract self-checking: the
    * melted rows must equal the pre-pivot aggregation the oracle
    * computes directly.
    */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    qPivot(spark, sfDir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("total_f").as("F"), col("total_o").as("O"), col("total_p").as("P")),
        "o_orderstatus", "total")
      // absent (priority, status) cells melt to null totals; dropping
      // them restores exactly the pre-pivot aggregation rows
      .filter(col("total").isNotNull)
      .orderBy("o_orderpriority", "o_orderstatus")

  /** Moving average over a RANGE-style window frame: each order's price
    * averaged with the customer's previous two orders (ROWS BETWEEN 2
    * PRECEDING AND CURRENT ROW) — the frame-spec window variant the
    * rank-based queries don't cover. One shuffle by customer.
    */
  def qMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-2, Window.currentRow)
    // floor(x*100 + 0.5)/100 instead of round(): an avg of 3 prices
    // lands on exact .005 ties often enough that HALF_UP vs the oracle
    // engine's tie rule diverges; this formula is pure IEEE double ops,
    // bit-identical in any engine.
    t(spark, sfDir, "orders")
      .withColumn("mavg", floor(avg("o_totalprice").over(w) * 100 + 0.5) / 100)
      .select("o_custkey", "o_orderkey", "mavg")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set operations (INTERSECT / EXCEPT): customers ordering in both
    * 'F' and 'O' status, only 'F', and only 'O'. Spark plans INTERSECT/
    * EXCEPT as aggregate+join — no driver-side set logic.
    */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    def custs(status: String) =
      orders.filter(col("o_orderstatus") === status).select("o_custkey").distinct()
    // One action: tag each set-op result and count per tag (three
    // driver-side .count() calls would be three separate jobs).
    custs("F").intersect(custs("O")).select(lit("both_f_and_o").as("kind"))
      .unionByName(custs("F").except(custs("O")).select(lit("f_only").as("kind")))
      .unionByName(custs("O").except(custs("F")).select(lit("o_only").as("kind")))
      .groupBy("kind").agg(count(lit(1)).as("n"))
      .orderBy("kind")
  }

  /** Skew-resilient join surfaced as a query: lineitem ⋈ supplier via
    * [[SaltedJoin]] (fact side salted R ways, dim side replicated R
    * ways), aggregated per nation. Salting is SEMANTICALLY INVISIBLE —
    * the oracle runs the plain join — which is exactly the contract a
    * skew-mitigation rewrite must satisfy; this query hash-verifies it.
    */
  def qSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = t(spark, sfDir, "lineitem")
    val supplier = t(spark, sfDir, "supplier")
    SaltedJoin.join(lineitem, supplier, col("l_suppkey"), col("s_suppkey"), salts = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("s_nationkey")
  }

  /** Sessionization over the events stream table: a new session starts
    * after a >30 min gap per user; emits per-session stats. Lag/window
    * based — the standard scalable batch sessionization (single shuffle
    * by user, no driver state).
    */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val events = loadEvents(spark, sfDir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800, 1).otherwise(0))
      .withColumn("session_seq", sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    events.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(sum("total_value"), 2).as("total_value"))
      .orderBy("user_id")
  }

  /** Left-semi + left-anti join: customers with and without orders. */
  def qSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders")
    val withOrders = customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
    val withoutOrders = customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).withColumn("kind", lit("without_orders"))
    withOrders.unionByName(withoutOrders).select("kind", "n").orderBy("kind")
  }

  /** Top-k parts per brand by retailprice (dense_rank). */
  def qTopKPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), col("p_partkey"))
    t(spark, sfDir, "part")
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "p_partkey", "rk")
      .orderBy("p_brand", "rk", "p_partkey")
  }

  /** Distinct-count aggregation (exact): one pass, two distinct keys.
    * At scale Spark expands this to partial sets per key — the
    * approx_count_distinct (HLL) variant is the cheap path; exact kept
    * here so the oracle can verify.
    */
  def qDistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** Full outer join coverage: customers ⋈ orders with unmatched sides
    * counted — the null-handling surface of join planning.
    */
  def qOuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders")
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "full_outer")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_customer_only"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_order_only"),
        count(when(col("c_custkey").isNotNull && col("o_orderkey").isNotNull, 1)).as("n_matched"))
  }

  /** Exact percentiles of l_extendedprice (median/p90/p99). One
    * array-argument percentile call: Spark's Percentile aggregate
    * buffers the full value multiset PER EXPRESSION, so three scalar
    * calls would sort the column three times. floor(x*100+0.5)/100,
    * not round(): interpolated percentiles land on .xx5 midpoints
    * where Spark's decimal HALF_UP and the oracle's binary rounding
    * disagree (the repo-wide cross-engine rounding rule).
    */
  def qPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ps"),
        (floor(min("l_extendedprice") * 100 + 0.5) / 100).as("pmin"),
        (floor(max("l_extendedprice") * 100 + 0.5) / 100).as("pmax"))
      .select(
        (floor(col("ps")(0) * 100 + 0.5) / 100).as("p50"),
        (floor(col("ps")(1) * 100 + 0.5) / 100).as("p90"),
        (floor(col("ps")(2) * 100 + 0.5) / 100).as("p99"),
        col("pmin"), col("pmax"))

  /** Quantile-sketch contract (twin of [[qApproxDistinct]]):
    * `percentile_approx` (GK sketch, accuracy 10000 → rank error
    * ≤ n/10000) beside the exact interpolated percentile, with the
    * sketch pinned inside the exact [p49, p51] band by the oracle. The
    * exact percentile needs the full sorted value set per group; the
    * sketch is a bounded buffer that partial-aggs map-side — at 100 TB
    * only the sketch path is runnable, and this query is its
    * trustworthiness certificate on this data.
    */
  def qApproxPercentile(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .agg(
        // one exact buffer for all three quantiles (Percentile buffers
        // the full multiset per expression); floor rule for the pin
        expr("percentile(l_extendedprice, array(0.49D, 0.5D, 0.51D))").as("ps"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx"))
      .select(
        (floor(col("ps")(1) * 100 + 0.5) / 100).as("exact_p50"),
        (col("approx") >= col("ps")(0) && col("approx") <= col("ps")(2)).as("approx_ok"))

  /** As-of join through the custom operator (graft.plans.AsOfJoin):
    * enrich each event with the latest order (by date) of its customer
    * cohort at or before the event time, then aggregate per cohort.
    * Orders are pre-aggregated to unique (cohort, time) keys so the
    * time-tie winner is deterministic and externally checkable —
    * DuckDB's native ASOF LEFT JOIN is the oracle.
    */
  def qAsofJoin(spark: SparkSession, sfDir: String,
                tolerance: Option[Long] = None): DataFrame = {
    val events = loadEvents(spark, sfDir)
      .select(col("event_id"), pmod(col("user_id"), lit(50)).as("k"),
        unix_micros(col("ts")).as("t"))
    val orders = t(spark, sfDir, "orders")
      .groupBy(pmod(col("o_custkey"), lit(50)).as("k2"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t2"))
      .agg(max("o_orderkey").as("okey"))
    graft.plans.AsOf.join(events, orders,
        Seq(events("k")), Seq(orders("k2")), events("t"), orders("t2"), tolerance)
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"),
        count(col("okey")).as("n_matched"),
        max(col("okey")).as("max_okey"))
      .orderBy("k")
  }

  /** Pure-SQL surface: the same engine drives `spark.sql` text — temp
    * views over the parquet tables plus the graft-registered custom
    * expressions (vec_cosine is `functions/CosineSimExpr`, codegen'd,
    * resolved through the session function registry exactly as a
    * `spark.sql.extensions` deployment would resolve it).
    */
  def qSqlVec(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("embeddings_v")
    spark.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(vec_cosine(a.embedding, b.embedding), 6) AS cosine,
        |  round(vec_dot(a.embedding, b.embedding), 6) AS dot
        |FROM embeddings_v a JOIN embeddings_v b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id % 10 = 0
        |ORDER BY id_a""".stripMargin)
  }

  /** FORWARD as-of join (pandas merge_asof `direction='forward'`):
    * each view event matches the user's EARLIEST purchase at-or-after
    * it — the "next conversion" lookup, the direction the backward
    * operator can't express. Runs through the SAME backward
    * linear-merge SparkPlan by TIME NEGATION: latest(−t₂) ≤ −t ⟺
    * earliest(t₂) ≥ t, so one physical operator serves both directions
    * (the classic reduction — no second plan to build, test, and keep
    * in sync). Purchases are pre-aggregated to unique (user, time)
    * keys so the tie winner is deterministic; the oracle is DuckDB's
    * native forward ASOF (`ON v.t <= p.t2`).
    */
  def qAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = loadEvents(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id").as("k"),
        (-unix_micros(col("ts"))).as("tn"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("k2"), unix_micros(col("ts")).as("t2"))
      .agg(max("event_id").as("pid"))
      .select(col("k2"), (-col("t2")).as("t2n"), col("pid"))
    graft.plans.AsOf.join(views, purchases,
        Seq(views("k")), Seq(purchases("k2")), views("tn"), purchases("t2n"))
      .groupBy(pmod(col("k"), lit(50)).as("cohort"))
      .agg(count(lit(1)).as("n_views"),
        count(col("pid")).as("n_matched"),
        max(col("pid")).as("max_pid"))
      .orderBy("cohort")
  }

  /** As-of join with a staleness TOLERANCE (pandas merge_asof
    * `tolerance`): matches older than `tolUs` microseconds are dropped.
    * The synthetic event/order gap clusters around 8195-8224 days, so
    * 8210 days splits matched/unmatched non-trivially — exercising the
    * tolerance branch of the custom plan, verified against DuckDB ASOF
    * plus an explicit staleness filter.
    */
  def qAsofTolerance(spark: SparkSession, sfDir: String,
                     tolUs: Long = 8210L * 86400L * 1000000L): DataFrame =
    qAsofJoin(spark, sfDir, tolerance = Some(tolUs))

  /** Key-skew diagnostic: the log2 histogram of per-key row counts —
    * what you inspect BEFORE choosing between a plain, broadcast, or
    * salted join on a key. Two-level aggregation: the per-key count is
    * map-side combined (shuffle carries one row per distinct key), and
    * the histogram is |buckets| rows. `length(bin(cnt))` is
    * floor(log2)+1 in exact integer arithmetic — float log2 disagrees
    * across engines at exact powers of two.
    */
  def qSkewHistogram(spark: SparkSession, sfDir: String): DataFrame =
    loadEvents(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .groupBy(length(bin(col("cnt"))).as("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"))
      .orderBy("log2_bucket")

  /** Sketch-based distinct counting with an accuracy CONTRACT: HLL++
    * (`approx_count_distinct`, rsd 2%) next to the exact count, with
    * the |approx-exact|/exact <= 5% boolean pinned by the oracle. At
    * 100 TB the exact distinct is a full shuffle of every distinct key;
    * the sketch is a fixed few-KB buffer per group that partial-aggs
    * map-side — this query is the certificate that the cheap path is
    * trustworthy on this data.
    */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    loadEvents(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact") * 0.05).as("approx_ok"))
      .orderBy("event_type")

  /** Semi-structured extraction: the event payload is a JSON string
    * column, parsed schema-on-read with `from_json` in the scan
    * projection — one pass, no ETL staging table, malformed documents
    * degrade to NULL (PERMISSIVE) and are COUNTED rather than dropped
    * silently (n vs n_parsed). At 100 TB the alternative — exploding
    * raw JSON into a staged wide table — doubles storage and the
    * write path; schema-on-read keeps extraction inside the query.
    */
  def qJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    loadEvents(spark, sfDir)
      .select(col("event_type"),
        from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_parsed"),
        // floor(x*100+0.5)/100, not round(): an avg of many ints lands on
        // .xx5 boundaries where Spark and DuckDB round doubles apart.
        (floor(avg("k") * 100 + 0.5) / 100).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Interval/range join WITHOUT an equi key, in the shape that scales:
    * the 20 highest-value events define ±10-minute incident windows;
    * every event landing in a window is aggregated per window. The
    * naive plan is a broadcast-nested-loop over the inequality —
    * O(n·w) comparisons always. Instead each window EXPLODES into the
    * fixed-width time buckets it overlaps and the corpus joins on the
    * bucket as an equi key (hash join, codegen) with the exact interval
    * test as a residual filter — O(n + candidates). Bucket width =
    * window width, so each window spans ≤ 3 buckets and a probe row
    * joins ≤ its true windows + same-bucket near-misses.
    */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketUs = 20L * 60L * 1000000L // bucket = full window width
    val ev = loadEvents(spark, sfDir)
    val windows = ev.orderBy(desc("value"), asc("event_id")).limit(20)
      .select(col("event_id").as("window_id"),
        (unix_micros(col("ts")) - 600000000L).as("ws"),
        (unix_micros(col("ts")) + 600000000L).as("we"))
      .withColumn("bucket",
        explode(sequence(floor(col("ws") / bucketUs), floor(col("we") / bucketUs))))
    ev.select(col("event_id"), col("value"), unix_micros(col("ts")).as("t"))
      .withColumn("bucket", floor(col("t") / bucketUs))
      .join(broadcast(windows), "bucket")
      .where(col("t") >= col("ws") && col("t") < col("we"))
      .groupBy("window_id")
      // floor rule (not round): a sum of many doubles is exactly the
      // shape where cross-engine rounding of .xx5 diverges.
      .agg(count(lit(1)).as("n_events"),
        (floor(sum("value") * 100 + 0.5) / 100).as("total_value"))
      .orderBy("window_id")
  }

  /** Batch equivalent of the streaming windowed aggregation
    * (graft.streaming.EventStream) — 1h tumbling windows per event_type.
    */
  def qStreamAggBatch(spark: SparkSession, sfDir: String): DataFrame =
    loadEvents(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")
}
