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

  test("upsampling: anchor stays at 1 epoch, >=2 strata genuinely repeat") {
    val rows = CorpusMix.mixUp(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("lang")).toSeq == Seq("de", "en", "es", "fr", "zh"))
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    // exactly one anchor stratum at exactly 1 epoch (emitted == before)
    val anchors = rows.filter(r => r.getAs[Long]("n_emitted") == r.getAs[Long]("n_before"))
    assert(anchors.length == 1, s"expected one anchor: ${anchors.toSeq}")
    assert(anchors.head.getAs[Double]("epochs") == 1.0)
    // the target must force >= 2 strata past a FULL extra epoch
    // (repeat factor > 1 with floor(r) >= 2 — not just fractional), so
    // the operator demonstrably expresses "2.x epochs of l"
    val multiEpoch = rows.filter(_.getAs[Double]("epochs") >= 2.0)
    assert(multiEpoch.length >= 2, s"expected >=2 multi-epoch strata: ${rows.toSeq}")
    // every stratum emits at least its input (upsampling never drops)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emitted") >= r.getAs[Long]("n_before"), r.toString)
    }
    // realized shares approach targets within fractional-epoch noise
    rows.foreach { r =>
      val diff = math.abs(r.getAs[Double]("realized_share") - r.getAs[Double]("target_share"))
      assert(diff < 0.05, s"${r.getAs[String]("lang")} off target by $diff")
    }
  }

  test("upsampled corpus matches the audit, with unique addressable copy ids") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val up = CorpusMix.upsampled(docs)
    val audit = CorpusMix.mixUp(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_emitted")).toMap
    val got = up.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(got == audit, s"emitted census must match the audit: $got vs $audit")
    // copies are addressable: ids unique, epoch recoverable by division
    assert(up.select("doc_id").distinct().count() == up.count())
    // epoch-0 rows are exactly the original membership of each stratum
    val epoch0 = up.filter(col("doc_id") < CorpusMix.EpochOffset).count()
    assert(epoch0 == docs.count(), "every original doc appears in epoch 0")
    assert(up.columns.sorted.toSeq == docs.columns.sorted.toSeq)
  }

  test("sampled keeps all original columns") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(CorpusMix.sampled(docs).columns.sorted.toSeq == docs.columns.sorted.toSeq)
  }
}
