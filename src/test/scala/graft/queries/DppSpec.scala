package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class DppSpec extends SparkSpec {

  test("dim filter runtime-prunes the nation-partitioned fact scan") {
    val path = Dpp.writePartitionedFact(spark, sf0001)
    val df = Dpp.prunedJoin(spark, path, sf0001)
    val rows = df.collect()
    // 5 of 25 nations are ASIAn; the tiny sf0.001 supplier table may
    // cover only a subset of them.
    assert(rows.length >= 1 && rows.length <= 5,
      s"expected 1..5 ASIAn supplier nations, got ${rows.length}")

    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"fact scan must carry a dynamic pruning partition filter:\n$p")
    assert(p.contains("SubqueryBroadcast") && p.contains("ReusedExchange"),
      s"the pruning subquery must REUSE the join's broadcast, not recompute the dim:\n$p")

    // Physical evidence: the scan reads fewer files than exist on disk
    // (20 of the 25 nation directories are skipped).
    // AQE wraps pipeline segments in QueryStageExec LEAF nodes, so a
    // plain collect stops at stage boundaries — recurse through them.
    def deepScans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val direct = plan.collect { case s: FileSourceScanExec => s }
      val nested = plan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      }.flatMap(deepScans)
      direct ++ nested
    }
    val factScan = deepScans(df.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("dpp-")))
    assert(factScan.isDefined, s"no fact FileSourceScan found:\n$p")
    val filesRead = factScan.get.metrics("numFiles").value
    val onDisk = {
      val root = java.nio.file.Paths.get(path)
      val it = java.nio.file.Files.walk(root)
      try it.filter(f => f.toString.endsWith(".parquet")).count()
      finally it.close()
    }
    assert(filesRead > 0 && filesRead < onDisk,
      s"pruning must skip partition files: read $filesRead of $onDisk")
  }
}
