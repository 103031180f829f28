package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning: a filter on the partition column must become a
  * planning-time PartitionFilter (directory pruning), not a row-level
  * data filter — the difference between reading 1/N of 100 TB and all
  * of it.
  */
class PartitionedSpec extends SparkSpec {

  test("partitioned layout prunes directories for partition-column filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part-").toString
    Partitioned.partitionEvents(spark, sf0001, s"$dir/events")

    val types = Partitioned.read(spark, s"$dir/events")
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(types.length >= 2, "need multiple partitions to demonstrate pruning")

    val one = Partitioned.read(spark, s"$dir/events")
      .filter(col("event_type") === types.head)
    val plan = one.queryExecution.executedPlan.toString

    // the predicate lands in PartitionFilters, and DataFilters stays empty
    assert(plan.replaceAll("\\s+", " ")
      .matches("(?s).*PartitionFilters: \\[[^\\]]*event_type.*"),
      s"expected a planning-time partition filter:\n$plan")
    assert(plan.replaceAll("\\s+", " ").matches("(?s).*DataFilters: \\[\\].*"),
      s"partition-column filter must not run as a row filter:\n$plan")

    // and the executed scan reads only that partition's files (the
    // relation lists all N; pruning shows in the scan's numFiles metric)
    val expected = graft.queries.Analytics.loadEvents(spark, sf0001)
      .filter(col("event_type") === types.head).count()
    assert(one.count() == expected)
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numFiles")).get
    val totalFiles = Partitioned.read(spark, s"$dir/events").inputFiles.length
    assert(scan.metrics("numFiles").value < totalFiles,
      s"pruned scan must read fewer than all $totalFiles files")
  }
}
