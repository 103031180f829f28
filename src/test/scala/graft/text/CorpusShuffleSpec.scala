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

  test("physical writer: per-shard files are internally in training order, " +
    "audit manifest equals the logical manifest, no global sort in the write") {
    val audit = CorpusShuffle.corpusShuffleWrite(spark, sf0001).collect()
    assert(audit.nonEmpty && audit.forall(_.getBoolean(7)),
      "every shard's files must be internally okey-ordered")
    val manifest = CorpusShuffle.corpusShuffle(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getLong(6)))
    val auditCore = audit.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getString(4), r.getLong(5), r.getLong(6)))
    assert(auditCore.toSeq == manifest.toSeq,
      "the file-derived manifest must equal the logical one value-for-value")
    // the WRITE plan itself: hash exchange + local sort only — a global
    // total-order exchange would show as rangepartitioning
    val p = {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"),
          md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))).as("okey"),
          (conv(substring(md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))), 1, 2), 16, 10)
            .cast("long") % 16).as("shard"))
        .repartition(16, col("shard"))
        .sortWithinPartitions(col("shard"), col("okey"))
        .queryExecution.executedPlan.toString
    }
    assert(!p.contains("rangepartitioning"),
      s"the shard write must never globally sort:\n$p")
    assert(p.contains("Sort") && p.contains("hashpartitioning"),
      s"expected local sorts over one hash exchange:\n$p")
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
