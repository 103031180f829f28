package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatacardSpec extends SparkSpec {

  test("planted card: volumes, duplicate mass, and densities hand-derived; " +
    "case-variant copies count as exact duplicates (the dedup_exact key)") {
    import spark.implicits._
    // en ×2 exact copies (one case-variant — lower() normalizes), one
    // distinct en doc, one unknown doc with digits + punctuation
    val docs = Seq(
      (1L, "the cat and the hat"),
      (2L, "The cat AND the hat"), // same lower-text → duplicate group
      (3L, "the dog of war"),
      (4L, "zz42!! zz")
    ).toDF("doc_id", "text")
    val card = Datacard.card(docs).collect()
      .map(r => r.getString(0) -> r).toMap

    val en = card("en")
    assert(en.getLong(1) == 3, "three docs classify en")
    assert(en.getLong(2) == (19L + 19L + 14L), "en chars")
    assert(en.getLong(3) == (5L + 5L + 4L), "en whitespace tokens")
    assert(en.getLong(5) == 2L,
      "the case-variant pair is ONE duplicate group of mass 2")
    assert(en.getLong(6) == 0L && en.getLong(7) == 0L, "no punct/digits in en")

    val unk = card("unknown")
    assert(unk.getLong(1) == 1 && unk.getLong(5) == 0L)
    // "zz42!! zz": 9 chars, 2 digits, 2 punct → permille = 222 (exact div)
    assert(unk.getLong(6) == (1000L * 2 / 9) && unk.getLong(6) == 222L, "punct permille")
    assert(unk.getLong(7) == 222L, "digit permille")
    // bpeish tokens: zz|42|!|! zz → 5
    assert(unk.getLong(4) == 5L, "bpeish token count")
  }

  test("near-dup card: the near-dup column equals the planted-chain ground " +
    "truth (3 docs per eligible chain, by the keeper's language) and the " +
    "other columns equal the plain card's") {
    val nd = Datacard.corpusDatacardNearDup(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val plain = Datacard.corpusDatacard(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nd.keySet == plain.keySet, "same language rows")
    plain.foreach { case (lang, p) =>
      val n = nd(lang)
      // card columns unchanged by the composition (n_neardup_docs is
      // inserted at position 6; permilles shift right by one)
      assert((1 to 5).forall(i => n.getLong(i) == p.getLong(i)) &&
        n.getLong(7) == p.getLong(6) && n.getLong(8) == p.getLong(7),
        s"$lang: card columns drifted")
    }
    // ground truth: every eligible doc (even id, >= 60 raw tokens) roots
    // a {a, a+1M, a+2M} chain — 3 near-dup docs attributed to its language
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val expect = Datacard.signals(docs)
      .filter(col("doc_id") % 2 === 0 && col("wst") >= 60)
      .groupBy("pred").agg((count(lit(1)) * 3).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    nd.foreach { case (lang, r) =>
      assert(r.getLong(6) == expect.getOrElse(lang, 0L),
        s"$lang near-dup mass: got ${r.getLong(6)}, planted ${expect.getOrElse(lang, 0L)}")
    }
    assert(expect.values.sum > 0, "the planted chains must be non-empty")
  }

  test("corpus card: language rows partition the corpus; totals equal the " +
    "proven single-signal operators' totals") {
    val rows = Datacard.corpusDatacard(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "every doc lands in exactly one language row")
    val expect = docs.agg(
      sum(length(col("text"))),
      sum(TextOps.wsTokenCount(col("text")).cast("long")),
      sum(TextOps.bpeishTokenCount(col("text")).cast("long"))).head()
    assert(rows.map(_.getLong(2)).sum == expect.getLong(0), "char total")
    assert(rows.map(_.getLong(3)).sum == expect.getLong(1), "ws token total")
    assert(rows.map(_.getLong(4)).sum == expect.getLong(2), "bpeish token total")
    assert(rows.forall(r => r.getLong(6) >= 0 && r.getLong(6) < 1000),
      "permille densities in range")
  }
}
