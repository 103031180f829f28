package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusShardSpec extends SparkSpec {

  test("pack: every document lands in exactly one shard and token totals reconcile") {
    val shards = CorpusShard.pack(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val nDocs = docs.count()
    val totalTokens = docs
      .agg(sum(regexp_count(col("text"), lit("\\S+")))).collect()(0).getLong(0)
    assert(shards.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(shards.map(_.getAs[Long]("shard_tokens")).sum == totalTokens)
  }

  test("pack: shards are contiguous from 0 and start under budget within each window") {
    val rows = CorpusShard.pack(spark, sf0001).collect()
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"))).foreach {
      case (_, ws) =>
        val ids = ws.map(_.getAs[Int]("shard")).sorted
        assert(ids.head == 0 && ids.sameElements(ids.head to ids.last),
          s"shard ids must be contiguous: ${ids.mkString(",")}")
        // a shard holds the docs whose preceding cumulative count lies in
        // [shard*budget, (shard+1)*budget): all but its last doc started
        // under the budget line, so every NON-final shard's span except
        // the overhang is bounded — cheap invariant: each non-final
        // shard carries at least one document and a positive token count
        ws.foreach { r =>
          assert(r.getAs[Long]("n_docs") >= 1 && r.getAs[Long]("shard_tokens") > 0)
          assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
        }
    }
  }

  test("pack: doc_id spans of consecutive shards never overlap (order preserved)") {
    val rows = CorpusShard.pack(spark, sf0001).collect()
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"))).foreach {
      case (_, ws) =>
        val byShard = ws.sortBy(_.getAs[Int]("shard"))
        byShard.zip(byShard.tail).foreach { case (a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            "packing must preserve doc_id order across shards")
        }
    }
  }

  test("pack: budget sweep — totals invariant, shard count shrinks as budget grows") {
    val budgets = Seq(500L, 2000L, 8000L)
    val results = budgets.map(b => b -> CorpusShard.pack(spark, sf0001, budget = b).collect())
    val totals = results.map { case (_, rows) =>
      (rows.map(_.getAs[Long]("n_docs")).sum, rows.map(_.getAs[Long]("shard_tokens")).sum)
    }
    assert(totals.distinct.length == 1,
      s"doc and token totals must be budget-invariant: $totals")
    val shardCounts = results.map(_._2.length)
    assert(shardCounts.zip(shardCounts.tail).forall { case (a, b) => a >= b },
      s"shard count must weakly decrease with budget: $shardCounts")
  }

  test("split: custom fractions shift the realized census accordingly") {
    val even = CorpusShard.split(spark, sf001, trainFrac = 0.5, valFrac = 0.25).collect()
    val n = even.map(_.getAs[Long]("n_docs")).sum.toDouble
    val frac = Map("train" -> 0.5, "val" -> 0.25, "test" -> 0.25).map { case (s, want) =>
      s -> (even.filter(_.getAs[String]("split") == s).map(_.getAs[Long]("n_docs")).sum / n, want)
    }
    frac.foreach { case (s, (got, want)) =>
      assert(math.abs(got - want) < 0.12, s"$s realized $got vs design $want")
    }
  }

  test("split: per-lang fractions sum to 1 and land near 80/10/10") {
    val rows = CorpusShard.split(spark, sf001).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val fracSum = rs.map(_.getAs[Double]("frac")).sum
      assert(math.abs(fracSum - 1.0) < 0.001, s"$lang fracs must sum to 1, got $fracSum")
    }
    // split is per-row arithmetic, so pooled across langs the realized
    // fractions concentrate near the design point
    val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val trainFrac = rows.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"pooled train frac $trainFrac")
  }

  test("split: membership is a pure function of doc_id — stable across runs") {
    val a = CorpusShard.split(spark, sf0001).collect().map(_.toString).sorted
    val b = CorpusShard.split(spark, sf0001).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("writeShards: read-back census equals the manifest; layout is shard-addressable") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards-spec").toString
    try {
      val census = CorpusShard.writeShards(spark, sf0001, Some(out)).collect().map(_.toString)
      val manifest = CorpusShard.pack(spark, sf0001).collect().map(_.toString)
      assert(census.toSeq == manifest.toSeq,
        "what was WRITTEN must reconcile with what was PLANNED")
      // every (lang,bucket,shard) is its own directory — partition
      // pruning can address a single shard without touching the rest
      val dirs = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        .filter(p => p.getFileName.toString.startsWith("shard=")).count()
      assert(dirs == manifest.length, s"$dirs shard dirs for ${manifest.length} manifest rows")
      // the written rows are tokenizer-consumable: text + token count survive
      val back = spark.read.parquet(out)
      assert(back.columns.toSet == Set("doc_id", "text", "n_tokens", "lang", "bucket", "shard"))
      assert(back.filter(col("text").isNull).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("writeShards: maxRecordsPerFile caps any single file") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards-cap").toString
    try {
      CorpusShard.writeShards(spark, sf0001, Some(out), maxRecordsPerFile = 2).collect()
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toArray.map(_.toString)
      assert(files.nonEmpty)
      files.foreach { f =>
        val n = spark.read.parquet(f).count()
        assert(n <= 2, s"$f holds $n rows > cap 2")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
