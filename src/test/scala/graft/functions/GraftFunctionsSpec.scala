package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("simhash_agg matches the columnar simhash expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("alpha beta", "beta gamma", "gamma delta")),
      (2L, Seq("alpha beta", "beta gamma", "gamma delta")),      // identical set
      (3L, Seq("zebra yak", "yak xylophone", "unrelated words"))
    ).toDF("doc_id", "sh")
    val viaAgg = docs
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id")
      .agg(GraftFunctions.simhash_agg(xxhash64(col("s"))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docs
      .select(col("doc_id"), graft.dedup.Dedup.simhash(col("sh")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaExpr)
    assert(viaAgg(1L) == viaAgg(2L), "identical shingle sets -> identical fingerprints")
    assert(viaAgg(1L) != viaAgg(3L), "different docs -> different fingerprints")
  }

  test("registered SQL functions evaluate the custom expressions") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
      .createOrReplaceTempView("e_funcs")
    val r = spark.sql(
      """SELECT round(vec_cosine(embedding, embedding), 6) AS self_cos,
        |       vec_distsq(embedding, embedding) AS self_dist,
        |       round(vec_dot(embedding, embedding), 6) AS normsq
        |FROM e_funcs""".stripMargin).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(0) == 1.0)
      assert(row.getDouble(1) == 0.0)
      assert(row.getDouble(2) > 0.0)
    }
    val sim = spark.sql(
      "SELECT simhash_agg(xxhash64(CAST(vec_id AS STRING))) FROM e_funcs").collect()
    assert(sim.length == 1)
  }

  test("topk_by keeps the k best (score desc, id asc) with map-side heaps") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 12L), (1L, 0.1, 13L),
      (2L, 0.7, 20L), (2L, 0.7, 21L), (2L, 0.6, 22L))
      .toDF("g", "score", "id").repartition(4)
    val got = df.groupBy("g")
      .agg(GraftFunctions.topk_by(col("score"), col("id"), 2).as("top"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getLong(0), e.getDouble(1))))
      .toMap
    // ties break to the LOWER id; output is best-first
    assert(got(1L) == Seq((11L, 0.9), (12L, 0.9)), got(1L).toString)
    assert(got(2L) == Seq((20L, 0.7), (21L, 0.7)), got(2L).toString)
    // SQL registration path agrees
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("topk_src")
    val viaSql = spark.sql(
      "SELECT g, topk_by(score, id, 2) AS top FROM topk_src GROUP BY g").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getLong(0), e.getDouble(1))))
      .toMap
    assert(viaSql == got)
  }
}
