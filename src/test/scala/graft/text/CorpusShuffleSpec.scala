package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusShuffleSpec extends SparkSpec {

  test("the permutation is a bijection: unique keys, every doc placed once") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val keyed = docs.select(
      md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))).as("okey"))
    assert(keyed.distinct().count() == docs.count(),
      "order keys must be collision-free — a collision merges two docs' positions")
    val manifest = CorpusShuffle.corpusShuffle(spark, sf0001).collect()
    assert(manifest.map(_.getLong(1)).sum == docs.count(),
      "every doc lands in exactly one shard")
  }

  test("deterministic given the seed; a different seed is a different permutation") {
    val a = CorpusShuffle.corpusShuffle(spark, sf0001).collect().toSeq
    val b = CorpusShuffle.corpusShuffle(spark, sf0001).collect().toSeq
    assert(a == b, "same seed must reproduce the identical manifest")
    val c = CorpusShuffle.corpusShuffle(spark, sf0001, seed = "other").collect().toSeq
    assert(a.map(_.getLong(1)).sum == c.map(_.getLong(1)).sum &&
      a != c, "a different seed keeps the doc mass but permutes differently")
  }

  test("the shuffle breaks source runs: shard membership is independent of " +
    "doc_id order (adjacent ids scatter)") {
    val manifest = CorpusShuffle.corpusShuffle(spark, sf0001, shards = 16).collect()
    assert(manifest.length == 16, "all 16 shards populated at sf0.001")
    // balance in expectation: no shard holds more than 3x the fair share
    val counts = manifest.map(_.getLong(1))
    assert(counts.max < 3 * (counts.sum / 16),
      s"hash sharding must balance: ${counts.mkString(",")}")
    // adjacent doc_ids must not stick together: check the first shard's
    // first/last docs aren't a contiguous id run artifact
    val ev = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))), 1, 2), 16, 10)
          .cast("long") % 16).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val sameShardAdjacent = ev.sortBy(_._1).sliding(2)
      .count(p => p.length == 2 && p(0)._2 == p(1)._2)
    val frac = sameShardAdjacent.toDouble / (ev.length - 1)
    assert(frac < 0.2, f"adjacent docs share a shard $frac%.2f of the time — " +
      "should be ~1/16 for a real permutation")
  }
}
