package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RareTokensSpec extends SparkSpec {

  test("every planted nonce doc is flagged; the natural corpus is clean") {
    val rows = RareTokens.rareTokenStats(spark, sf0001).collect()
    val flagged = rows.map(_.getAs[Long]("n_docs_flagged")).sum
    val occurrences = rows.map(_.getAs[Long]("rare_occurrences")).sum
    val nPlanted = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 25 === 0).count()
    assert(nPlanted > 0)
    assert(flagged == nPlanted, s"flagged $flagged vs planted $nPlanted")
    // two nonces per plant, zero natural rare tokens in the word-soup corpus
    assert(occurrences == 2 * nPlanted,
      s"rare occurrences $occurrences vs expected ${2 * nPlanted}")
  }

  test("rare set is frequency-bounded: a token used 3 times is not rare") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x", "common common common solo"),
      (1L, "x", "common common common duo duo"))
      .toDF("doc_id", "lang", "text")
    val toks = docs.select(col("doc_id"),
      explode(graft.dedup.Dedup.tokens(col("text"))).as("tok"))
    val rare = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
      .filter(col("tf") <= RareTokens.RareMax)
      .collect().map(_.getString(0)).toSet
    assert(rare == Set("solo", "duo"), s"got $rare")
  }
}
