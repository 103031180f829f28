package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan + semantics pins for the round-12 TPC-H decorrelation rows
  * (Q2 / Q15 / Q20 shapes) — the q_global_scalar discipline: every
  * query's SQL text runs verbatim in DuckDB as its oracle, and these
  * specs pin that Spark's optimizer actually DECORRELATES (no nested
  * loop, no per-row re-execution) plus an explicit-pipeline semantic
  * cross-check inside one engine.
  */
class DecorrelationMatrixSpec extends SparkSpec {

  private def scalarSubs(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
      })
    }.flatten

  private def assertNoLoopJoin(df: org.apache.spark.sql.DataFrame): Unit = {
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"),
      s"decorrelation must produce equi joins only:\n$planStr")
  }

  test("Q2 shape (q_min_cost_supplier): the correlated MIN decorrelates " +
    "away entirely (zero scalar subqueries in the optimized plan), all " +
    "joins are equi, and rows equal the explicit min-per-part pipeline") {
    val df = MinCostSupplier.qMinCostSupplier(spark, sf001)
    assert(scalarSubs(df).isEmpty,
      "the correlated MIN must rewrite to an aggregate + join, not survive as a subquery")
    assertNoLoopJoin(df)

    // explicit pipeline: regional offers -> min per part -> equality
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val supplier = spark.read.parquet(s"$sf001/supplier.parquet")
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
    val region = spark.read.parquet(s"$sf001/region.parquet")
    val offers = lineitem.groupBy(col("l_partkey").as("ps_partkey"),
      col("l_suppkey").as("ps_suppkey"))
      .agg(min(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .as("ps_supplycost"))
    val regional = offers
      .join(supplier, col("ps_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region.filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
    val minPer = regional.groupBy(col("ps_partkey").as("mp_partkey"))
      .agg(min("ps_supplycost").as("min_cost"))
    val expected = regional
      .join(minPer, col("ps_partkey") === col("mp_partkey") &&
        col("ps_supplycost") === col("min_cost"))
      .join(part.filter(col("p_size") <= 5 && col("p_type") === "PROMO"),
        col("ps_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        (col("ps_supplycost").cast("double") / 100).as("supplycost"))
      .collect().map(_.toSeq).toSet
    val got = df.collect().map(_.toSeq).toSet
    assert(got == expected && got.nonEmpty,
      s"Q2 rows drifted from the explicit pipeline (${got.size} vs ${expected.size})")
  }

  test("Q15 shape (q_top_revenue_view): the global MAX is ONE uncorrelated " +
    "scalar subquery, joins are equi, and the winner matches the explicit " +
    "aggregate-of-aggregate") {
    val df = TopRevenueView.qTopRevenueView(spark, sf001)
    val subs = scalarSubs(df)
    assert(subs.size == 1 && subs.head.outerAttrs.isEmpty,
      s"the view MAX must be one uncorrelated scalar subquery, got ${subs.size}")
    assertNoLoopJoin(df)

    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100) - floor(col("l_discount") * 100 + 0.5).cast("long")))
        .as("total_rev_u"))
    val maxRev = rev.agg(max("total_rev_u")).head().getLong(0)
    val winners = rev.filter(col("total_rev_u") === maxRev)
      .select("l_suppkey").collect().map(_.getLong(0)).toSet
    val got = df.collect()
    assert(got.map(_.getLong(0)).toSet == winners && got.nonEmpty,
      "Q15 winner set drifted from the explicit max")
    assert(got.forall(r => math.abs(r.getDouble(2) - maxRev / 10000.0) == 0.0),
      "revenue dollars must be the exact integer units / 10000")
  }

  test("Q20 shape (q_nested_in_scalar): both IN levels become LEFT-SEMI " +
    "joins, the correlated scalar aggregate decorrelates away, and rows " +
    "equal the explicit stock-vs-shipped pipeline") {
    val df = NestedInScalar.qNestedInScalar(spark, sf001)
    assert(scalarSubs(df).isEmpty,
      "the correlated shipped-quantity aggregate must decorrelate to a join")
    assertNoLoopJoin(df)
    val planStr = df.queryExecution.executedPlan.toString
    assert("LeftSemi".r.findAllIn(planStr).size >= 2,
      s"two IN levels must stack two left-semi joins:\n$planStr")

    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val supplier = spark.read.parquet(s"$sf001/supplier.parquet")
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
    val cut = lit("1996-01-01").cast("timestamp")
    val cutEnd = lit("1997-01-01").cast("timestamp")
    val offers = lineitem.filter(col("l_shipdate") < cut)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(sum("l_quantity").cast("long").as("ps_availqty"))
    val shipped = lineitem
      .filter(col("l_shipdate") >= cut && col("l_shipdate") < cutEnd)
      .groupBy(col("l_partkey").as("sh_partkey"), col("l_suppkey").as("sh_suppkey"))
      .agg(sum("l_quantity").as("sh_qty"))
    val smallParts = part.filter(col("p_name").startsWith("small"))
    val qualifying = offers
      .join(smallParts, col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped, col("ps_partkey") === col("sh_partkey") &&
        col("ps_suppkey") === col("sh_suppkey"))
      .filter(col("ps_availqty") > lit(0.5) * col("sh_qty"))
      .select(col("ps_suppkey")).distinct()
    val expected = supplier
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(nation.filter(col("n_name").isin("NATION_3", "NATION_8", "NATION_13")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "n_name").collect().map(_.toSeq).toSet
    val got = df.collect().map(_.toSeq).toSet
    assert(got == expected && got.nonEmpty,
      s"Q20 rows drifted from the explicit pipeline (${got.size} vs ${expected.size})")
  }
}
