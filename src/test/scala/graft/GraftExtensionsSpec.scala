package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven deployment path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` gets the as-of planner
  * strategy, the pushdown rule, and the SQL functions with NO
  * programmatic install calls.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions session plans as-of joins and resolves graft SQL functions") {
    // touch the shared session first so its lazy init can't interleave
    val shared = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is STATIC conf — with an already-running
    // SparkContext the builder option is ignored, so the spec wires the
    // same class through the public withExtensions hook (the config
    // string path is Spark's own plumbing over the identical call).
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // 1. injected SQL functions resolve without register()
      val d = s2.sql(
        "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
        .collect()(0).getDouble(0)
      assert(math.abs(d - 11.0) < 1e-9)

      // 2. an AsOfJoin plan executes WITHOUT AsOf.install — the strategy
      //    came from the extensions. Build the logical node directly so
      //    the API's own install() can't mask a missing injection.
      import s2.implicits._
      val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0)).toDF("sk", "tk", "px")
      val trades = Seq(("A", 2L), ("A", 7L)).toDF("s", "t")
      val plan = graft.plans.AsOfJoin(
        org.apache.spark.sql.graft.DatasetBridge.plan(trades),
        org.apache.spark.sql.graft.DatasetBridge.plan(quotes),
        Seq(org.apache.spark.sql.graft.ColumnBridge.expression(trades("s"))),
        Seq(org.apache.spark.sql.graft.ColumnBridge.expression(quotes("sk"))),
        org.apache.spark.sql.graft.ColumnBridge.expression(trades("t")),
        org.apache.spark.sql.graft.ColumnBridge.expression(quotes("tk")),
        tolerance = None)
      val out = org.apache.spark.sql.graft.DatasetBridge.ofRows(s2, plan)
        .select("t", "px").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out == Map(2L -> 10.0, 7L -> 11.0))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
