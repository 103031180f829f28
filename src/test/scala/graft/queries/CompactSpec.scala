package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {

  test("compaction shrinks the file count >=10x, respects the cap, and loses no row") {
    val target = 5000
    val (frag, n) = Compact.writeFragmented(spark, sf001)
    val out = Compact.compact(spark, sf001, frag, n, target)
    val before = Compact.parquetFiles(frag).length
    val after = Compact.parquetFiles(out).length
    assert(before >= 10 * after,
      s"fragmented layout ($before files) must compact >=10x (got $after)")
    // per-file cap holds for EVERY output file
    val perFile = spark.read.parquet(out).groupBy(input_file_name()).count().collect()
    assert(perFile.forall(_.getLong(1) <= target),
      s"files over the $target-row cap: ${perFile.filter(_.getLong(1) > target).mkString(",")}")
    // content identity: the full row multiset survives the rewrite
    // (partition column re-read included). XOR alone is blind to
    // even-multiplicity changes (a row duplicated twice cancels), so
    // the census pairs it with the row count — together they catch any
    // single-row change and any count drift.
    def census(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(struct(df.columns.sorted.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val base = spark.read.parquet(s"$sf001/orders.parquet")
    assert(census(spark.read.parquet(out)) == census(base),
      "compacted content must equal the base table row-for-row")
    assert(census(spark.read.parquet(frag)) == census(base),
      "fragmentation itself must also be content-preserving (sanity)")
  }

  test("q_compact emits the invisible census with both certificates true") {
    val rows = Compact.qCompact(spark, sf0001, targetRecordsPerFile = 2000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), "compact_ok must hold")
      assert(r.getBoolean(4), "cap_ok must hold")
    }
  }
}
