package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusMixSpec extends SparkSpec {

  test("limiting stratum is kept whole; others are thinned toward target") {
    val rows = CorpusMix.mix(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("lang")).toSeq == Seq("de", "en", "es", "fr", "zh"))
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    // en is the limiting stratum at this corpus' natural shares
    assert(byLang("en").getAs[Long]("n_kept") == byLang("en").getAs[Long]("n_before"))
    // every other stratum sheds docs
    Seq("de", "fr", "zh").foreach { l =>
      assert(byLang(l).getAs[Long]("n_kept") < byLang(l).getAs[Long]("n_before"), l)
    }
    // realized shares land within binomial noise of the targets
    rows.foreach { r =>
      val diff = math.abs(r.getAs[Double]("realized_share") - r.getAs[Double]("target_share"))
      assert(diff < 0.05, s"${r.getAs[String]("lang")} off target by $diff")
    }
  }

  test("sampled corpus matches the audit counts and is deterministic") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val s1 = CorpusMix.sampled(docs)
    val audit = CorpusMix.mix(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_kept")).toMap
    val got = s1.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(got == audit)
    // deterministic: same membership on a second evaluation
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = CorpusMix.sampled(docs).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("sampled keeps all original columns") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(CorpusMix.sampled(docs).columns.sorted.toSeq == docs.columns.sorted.toSeq)
  }
}
