package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  test("ngram multiset keeps multiplicity, distinct set does not") {
    val df = Seq("a b c a b c a b").toDF("text")
      .select(Dedup.tokens(col("text")).as("toks"))
      .select(
        Repetition.ngramMultiset(col("toks"), 3).as("multi"),
        Dedup.shinglesFromTokens(col("toks"), 3).as("dist"))
    val r = df.head()
    val multi = r.getSeq[String](r.fieldIndex("multi"))
    val dist = r.getSeq[String](r.fieldIndex("dist"))
    // 8 tokens -> 6 trigrams; "a b c" appears twice, "b c a"/"c a b" twice each
    assert(multi.length == 6)
    assert(multi.count(_ == "a b c") == 2)
    assert(dist.toSet == multi.toSet && dist.length == 3)
  }

  test("short docs produce no grams and drop out") {
    val df = Seq("a b", "x").toDF("text")
      .select(Dedup.tokens(col("text")).as("toks"))
      .select(explode(Repetition.ngramMultiset(col("toks"), 3)))
    assert(df.count() == 0)
  }

  test("planted degenerate docs are all flagged repetitive") {
    val rows = Repetition.repetitionStats(spark, sf0001).collect()
    // planted = eligible docs (doc_id % 10 == 0, >= 10 tokens): every one
    // must be flagged; natural word-soup docs must NOT reach ratio 0.2
    val nFlagged = rows.map(_.getAs[Long]("n_docs_repetitive")).sum
    val nPlanted = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 10 === 0 &&
        regexp_count(col("text"), lit("\\S+")) >= 10)
      .count()
    assert(nPlanted > 0)
    assert(nFlagged == nPlanted, s"flagged $nFlagged vs planted $nPlanted")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio > 0.0 && ratio < 0.5, s"lang-level ratio sane: $ratio")
      assert(r.getAs[Double]("max_top_share") <= 0.2,
        "planted top share is ~5/48, natural docs lower")
    }
  }

  test("a degenerate doc's own ratio clears the flag line by a wide margin") {
    val planted = Repetition.plantedRepetitionDocs(spark, sf0001)
      .filter(col("doc_id") >= 4 * Dedup.PlantOffset)
    val toks = planted.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val perDoc = toks.select(col("doc_id"),
      explode(Repetition.ngramMultiset(col("toks"), 3)).as("gram"))
      .groupBy("doc_id", "gram").count()
      .groupBy("doc_id")
      .agg(sum("count").as("total"), count(lit(1)).as("dist"))
      .select(col("doc_id"),
        ((col("total") - col("dist")).cast("double") / col("total")).as("ratio"))
    val min = perDoc.agg(org.apache.spark.sql.functions.min("ratio")).head().getDouble(0)
    assert(min > 0.5, s"every planted doc is majority-repeated grams, min=$min")
  }
}
