package graft.tools

import org.apache.spark.sql.SparkSession

/** Proof of the config-string extensions path in a FRESH JVM (the spec
  * suite can only exercise `.withExtensions` — `spark.sql.extensions`
  * is static conf, ignored once a SparkContext exists):
  * `sbt "runMain graft.tools.ExtensionsProbe"` must print EXT_OK lines
  * for the injected SQL function, the planner strategy, and the
  * pushdown rule, all wired purely by config.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-probe")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    println(s"EXT_OK function vec_dot=$d")

    // as-of join planned WITHOUT AsOf.install: build the logical node
    // directly; only the injected strategy can plan it.
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
    val joined = org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, plan)
    val rows = joined.select("t", "px").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    println(s"EXT_OK strategy asof=$rows")

    // pushdown rule active: the left-only filter must NOT remain above
    // the AsOfJoin (it is either below it or already folded into the
    // left LocalRelation by ConvertToLocalRelation — both prove the
    // rule moved it; built-in rules cannot see through the foreign node)
    val opt = joined.filter(trades("t") > 3L).queryExecution.optimizedPlan
    val filterStillAbove = opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[graft.plans.AsOfJoin] => f
    }.nonEmpty
    println(s"EXT_OK rule filter_above_asof=$filterStillAbove (false = pushed)")
    println(s"EXT_OK rule plan=${opt.toString.linesIterator.take(3).mkString(" | ")}")
    spark.stop()
  }
}
