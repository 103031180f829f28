package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FormatsSpec extends SparkSpec {

  private def census(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.select(xxhash64(struct(df.columns.sorted.map(col): _*)).as("h"))
      .agg(expr("bit_xor(h)"), count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("ORC round-trip is content-identical and predicate pushdown reaches the ORC scan") {
    val base = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-").toString
    Formats.writeOrc(base, dir)
    val back = Formats.readOrc(spark, dir)
    assert(census(back) == census(base), "ORC must carry the exact row multiset")

    // the scan must receive the filter (PushedFilters) and prune to
    // the two referenced columns — same discipline PlanAuditSpec pins
    // for parquet
    val q = back.filter(col("l_quantity") < 5).select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5"),
      s"filter must push into the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity"),
      s"scan must prune to referenced columns:\n$plan")
  }

  test("JSONL round-trip with explicit schema is content-identical (no inference scan)") {
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-").toString
    Formats.writeJsonl(base, dir)
    val back = Formats.readJsonl(spark, dir, base.schema).drop("_corrupt_record")
    assert(census(back.select(base.columns.map(col): _*)) == census(base),
      "JSONL with the explicit schema must carry the exact row multiset")
  }

  test("corrupt JSONL rows are quarantined with evidence, never fatal, never silently dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad-").toString
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """this is not json at all""",
      """{"id": 2, "name": "fine"}""",
      """{"id": "also-not-an-int" """)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    // Spark disallows querying ONLY _corrupt_record straight off the
    // raw source (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the
    // parse once, then triage; the same shape a real quarantine job has
    val got = Formats.readJsonl(spark, dir, schema).localCheckpoint()
    val parsed = got.filter(col("_corrupt_record").isNull)
    val corrupt = got.filter(col("_corrupt_record").isNotNull)
    assert(parsed.count() == 2 && corrupt.count() == 2,
      "two clean rows parse, two garbage lines quarantine")
    assert(parsed.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // the quarantine preserves the raw line — the evidence a triage
    // job needs
    assert(corrupt.select("_corrupt_record").collect()
      .exists(_.getString(0).contains("not json")))
  }
}
