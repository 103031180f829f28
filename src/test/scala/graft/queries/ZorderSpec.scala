package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class ZorderSpec extends SparkSpec {

  // AQE wraps pipeline segments in QueryStageExec leaves — recurse.
  private def deepScans(plan: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
    val direct = plan.collect { case s: FileSourceScanExec => s }
    val nested = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
    }.flatMap(deepScans)
    direct ++ nested
  }

  /** Rows the parquet reader actually emitted for the box query —
    * i.e. rows in row groups whose min/max stats survived the pushed
    * filters (per-row filtering happens later, in the Filter node).
    */
  private def scannedRows(path: String, bounds: (Long, Long, Long, Long)): (Long, Long) = {
    val df = Zorder.boxQuery(spark, path, bounds)
    val res = df.collect()
    val scan = deepScans(df.queryExecution.executedPlan)
    assert(scan.nonEmpty, "no file scan in box-query plan")
    (scan.map(_.metrics("numOutputRows").value).sum, res.head.getLong(0))
  }

  test("morton interleave is the bit-exact reference permutation") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 54321L))
      .toDF("a", "b")
      .select(Zorder.zValue(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .collect().map(_.getLong(0)).toSeq
    def ref(a: Long, b: Long): Long =
      (0 until 32).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val expected = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 54321L))
      .map { case (a, b) => ref(a, b) }
    assert(got == expected, s"$got vs $expected")
  }

  test("z-clustered layout skips most row groups on a box query; hash layout reads everything") {
    val bounds = Zorder.boxBounds(spark, sf0001)
    val total = spark.read.parquet(s"$sf0001/lineitem.parquet").count()

    val zPath = Zorder.writeZClustered(spark, sf0001)
    val hashPath = Zorder.writeHashShuffled(spark, sf0001)
    val (zScanned, zResult) = scannedRows(zPath, bounds)
    val (hScanned, hResult) = scannedRows(hashPath, bounds)

    // identical answers — clustering is semantically invisible
    assert(zResult == hResult && zResult > 0,
      s"box results must agree and be non-empty: z=$zResult hash=$hResult")
    // the hash layout's stats prune nothing: the reader emits ~every row
    assert(hScanned == total,
      s"hash layout should scan all $total rows, scanned $hScanned")
    // the z layout's compact per-file boxes skip most of the table for
    // a ~1/16-selectivity box (each key bounded to a quarter-range)
    assert(zScanned * 2 <= total,
      s"z layout should skip at least half the rows, scanned $zScanned of $total")
    assert(zScanned < hScanned,
      s"z layout must scan strictly less than hash layout: $zScanned vs $hScanned")
  }
}
