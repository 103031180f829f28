package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SampleSpec extends SparkSpec {

  test("exactly min(k, stratum) rows per language, ranked by the LCG permutation") {
    val strata = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sample.qSampleStratified(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val byLang = got.groupBy(_._1)
    assert(byLang.keySet == strata.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(50L, strata(lang)), s"stratum $lang size")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"$lang ranks")
    }
    // the selection is the LCG order, not id order or input order
    val docsByLang = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getString(1) -> r.getLong(0)).groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val expected = docsByLang(lang).map(_._2)
        .sortBy(id => ((id * 1103515245L + 12345L) % 2147483648L, id))
        .take(50).toSeq
      assert(rows.sortBy(_._3).map(_._2).toSeq == expected, s"$lang selection order")
    }
  }

  test("two runs produce the identical sample — no RNG state anywhere") {
    val base = Sample.qSampleStratified(spark, sf001).collect().toSeq
    val again = Sample.qSampleStratified(spark, sf001).collect().toSeq
    assert(base == again)
  }

  test("the rank-k cut runs as WindowGroupLimit, not a full stratum sort") {
    val p = Sample.qSampleStratified(spark, sf001).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }
}
