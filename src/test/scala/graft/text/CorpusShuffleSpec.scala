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
    "audit manifest equals the logical manifest, no global sort in the write, " +
    "no /tmp residue") {
    def residue(): Long = {
      val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val listing = java.nio.file.Files.list(tmp)
      try listing.filter(_.getFileName.toString.startsWith("graft-shuffle-out-")).count()
      finally listing.close()
    }
    val before = residue()
    val audit = CorpusShuffle.corpusShuffleWrite(spark, sf0001).collect()
    assert(residue() == before,
      "the writer must delete its written tree before returning — " +
        "a bench loop otherwise leaks a corpus-sized dir per invocation")
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
          (conv(substring(md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
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

  test("shuffle-pack: two-level okey-keyed prefix sum == naive global window; " +
    "reassembly invariants hold; the permutation actually changes the packing") {
    import org.apache.spark.sql.expressions.Window
    val cap = 64L
    // independent naive construction: ONE global window over okey order
    val naive = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"),
        md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))).as("okey"))
      .filter(col("nt") > 0)
      .withColumn("start", coalesce(sum("nt").over(
        Window.orderBy("okey").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "nt", "start")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val twoLevel = CorpusShuffle.shuffledStarts(spark, sf0001, "graft-r9")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(twoLevel == naive,
      "the distributed two-level prefix sum must equal the naive global window")

    val manifest = CorpusShuffle.corpusShufflePack(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // (1) per-doc spans are contiguous from offset 0 and sum to nt
    manifest.groupBy(_._1).foreach { case (doc, spans) =>
      val s = spans.sortBy(_._2)
      assert(s.head._3 == 0L, s"doc $doc first span must start at offset 0")
      s.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4,
          s"doc $doc spans must be contiguous")
        case _ =>
      }
      assert(s.map(_._4).sum == naive(doc)._1,
        s"doc $doc span lengths must sum to its token count")
    }
    // (2) every sequence except the last is exactly full
    val bySeq = manifest.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    val lastSeq = manifest.map(_._2).max
    bySeq.foreach { case (seq, tot) =>
      if (seq != lastSeq) assert(tot == cap, s"sequence $seq holds $tot != $cap")
      else assert(tot <= cap)
    }
    // (3) order sensitivity: packing the SHUFFLED stream is not packing
    // the doc_id stream — some doc's seq assignment must differ
    val plain = SeqPack.seqPackManifest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(manifest.map(_._4).sum == plain.map(_._4).sum,
      "both packings conserve total token mass")
    assert(manifest.toSet != plain.toSet,
      "the permutation must change sequence assignments")
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
        (conv(substring(md5(concat(lit("graft-r9:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 16).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val sameShardAdjacent = ev.sortBy(_._1).sliding(2)
      .count(p => p.length == 2 && p(0)._2 == p(1)._2)
    val frac = sameShardAdjacent.toDouble / (ev.length - 1)
    assert(frac < 0.2, f"adjacent docs share a shard $frac%.2f of the time — " +
      "should be ~1/16 for a real permutation")
  }
}
