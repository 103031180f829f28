package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {

  test("top-3 salient terms equal a naive driver-side recompute") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
    val n = docs.length.toLong
    val dfMap = docs.flatMap { case (_, toks) => toks.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }

    val expected = docs.flatMap { case (id, toks) =>
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      tf.toSeq
        .map { case (t, f) => (t, (f * n).toDouble / dfMap(t)) }
        .sortBy { case (t, s) => (-s, t) }
        .take(3).zipWithIndex
        .map { case ((t, s), i) => (id, (i + 1).toLong, t, s) }
    }.toSet

    val got = Tfidf.tfidfTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("top-k cut is WindowGroupLimit and the vocabulary side is never force-broadcast") {
    val p = Tfidf.tfidfTopK(spark, sf0001).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }
}
