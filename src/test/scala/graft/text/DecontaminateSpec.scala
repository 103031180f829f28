package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  test("every probe hits its own source; planted contamination is flagged") {
    val rows = Decontaminate.decontaminate(spark, sf0001).collect()
    val byId = rows.map(r => r.getAs[Long]("bench_doc_id") -> r).toMap
    // one output row per probe (docs % 37 with >= 8 tokens)
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val nProbes = d
      .filter(col("doc_id") % Decontaminate.ProbeEvery === 0 &&
        size(Dedup.tokens(col("text"))) >= Decontaminate.GramLen)
      .count()
    assert(rows.length.toLong == nProbes)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit_docs") >= 1L, "probe must hit its source")
    }
    // every %74 probe has a contaminated plant -> leaked
    byId.keys.filter(_ % Decontaminate.PlantEvery == 0).foreach { id =>
      val r = byId(id)
      assert(r.getAs[Boolean]("leaked"), s"probe $id has a plant, must leak")
      assert(r.getAs[Long]("n_hit_docs") >= 2L)
    }
  }

  test("plan broadcasts the probe side") {
    val plan = Decontaminate.decontaminate(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe join must be broadcast, got:\n$plan")
  }

  test("a doc containing a probe phrase mid-text is detected") {
    import spark.implicits._
    // gram alignment: the probe phrase occurs at a NON-prefix position
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "xxx yyy alpha beta gamma delta epsilon zeta eta theta zzz"))
      .toDF("doc_id", "text")
    val toks = corpus.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val probes = toks.filter(col("doc_id") === 0L)
      .select(col("doc_id").as("bench_doc_id"),
        concat_ws(" ", slice(col("toks"), 1, Decontaminate.GramLen)).as("gram"))
    val grams = toks.select(col("doc_id"),
      explode(Dedup.shinglesFromTokens(col("toks"), Decontaminate.GramLen)).as("gram"))
    val hits = grams.join(broadcast(probes), "gram").groupBy("bench_doc_id").count().head()
    assert(hits.getAs[Long]("count") == 2L, "probe found in both source and embedding doc")
  }
}
