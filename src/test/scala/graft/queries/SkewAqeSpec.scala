package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAqeSpec extends SparkSpec {

  test("AQE detects and splits the planted hot partition (skew=true in the final plan)") {
    SkewAqe.withScopedConfs(spark) {
      val df = SkewAqe.resolved(spark, sf001)
      df.collect() // the ADAPTIVE plan is only final after execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin must have split the hot partition:\n$plan")
    }
  }

  test("the runtime re-plan is invisible: result equals the same join with AQE skew handling off") {
    val withSplit = SkewAqe.qSkewAqe(spark, sf0001).collect().toSeq
    var plain: Seq[org.apache.spark.sql.Row] = Nil
    withSQLConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      plain = SkewAqe.resolved(spark, sf0001).collect().toSeq
    }
    assert(withSplit == plain, "skew splitting may change the plan, never the rows")
    // and the hot nation actually is hot: 80% of the fact lands on
    // supplier 1's nation, dwarfing its unskewed share
    val hot = withSplit.map(r => r.getLong(1)).max.toDouble /
      withSplit.map(r => r.getLong(1)).sum
    assert(hot > 0.6, s"planted hot key must dominate its partition (got $hot)")
  }
}
