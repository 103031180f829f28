package graft.text

import graft.SparkSpec

class LmSurpriseSpec extends SparkSpec {

  /** Brute-force reimplementation on the driver: same tokenization,
    * same add-one bigram model, same integer bitlen surprise — over
    * ALL docs (no top-k), so the operator's top-20 must be a prefix of
    * this ranking under the same (mean desc, doc_id asc) order.
    */
  private def brute(sfDir: String): Seq[(Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq)
    val bigrams = docs.flatMap { case (id, t) => t.zip(t.drop(1)).map(id -> _) }
    val cAb = bigrams.groupBy(_._2).map { case (g, xs) => g -> xs.length.toLong }
    val cA  = bigrams.groupBy(_._2._1).map { case (a, xs) => a -> xs.length.toLong }
    val v   = docs.flatMap(_._2).distinct.length.toLong
    def sup(g: (String, String)): Long =
      (64 - java.lang.Long.numberOfLeadingZeros((cA(g._1) + v) / (cAb(g) + 1))) - 1L
    docs.filter(_._2.length >= 2).map { case (id, t) =>
      val gs = t.zip(t.drop(1))
      val total = gs.map(sup).sum
      (id, gs.length.toLong, total, total * 1000 / gs.length)
    }.toSeq.sortBy { case (id, _, _, m) => (-m, id) }
  }

  test("top-20 equals a driver-side brute force of the exact-integer model") {
    val got = LmSurprise.textLmSurprise(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.length == 20)
    assert(got == brute(sf0001).take(20),
      "operator ranking must match the brute-force bigram model exactly")
  }

  test("surprise is scale-free integer arithmetic: deterministic across partitionings") {
    val a = LmSurprise.textLmSurprise(spark, sf0001).collect().toSeq
    var b: Seq[org.apache.spark.sql.Row] = Nil
    withSQLConf("spark.sql.shuffle.partitions" -> "7") {
      b = LmSurprise.textLmSurprise(spark, sf0001).collect().toSeq
    }
    assert(a == b, "integer scores cannot depend on the partitioning")
  }
}
