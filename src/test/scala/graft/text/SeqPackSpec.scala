package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkSpec {

  /** The naive single-global-window offsets — correct by inspection,
    * the reference the two-level distributed prefix sum must equal.
    */
  private def naive(sf: String, cap: Long) = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .filter(col("nt") > 0)
      .withColumn("start", coalesce(sum("nt").over(w), lit(0L)))
      .withColumn("n_spans",
        expr(s"(start + nt - 1) div ${cap}L") - expr(s"start div ${cap}L") + 1)
  }

  test("two-level distributed prefix sum equals the naive global cumsum, doc for doc") {
    val hist = SeqPack.corpusSeqPack(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = naive(sf001, 64L)
      .groupBy("n_spans").agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hist == expect)
    assert(hist.keySet.exists(_ >= 2),
      "some documents must actually split across sequences or the operator is vacuous")
    assert(hist.contains(1L), "and most documents should fit one sequence")
  }

  test("packing is tight: sequence count is exactly ceil(total_tokens / capacity)") {
    val cap = 64L
    val perDoc = naive(sf001, cap)
    val total = perDoc.agg(sum("nt")).head().getLong(0)
    val lastSeq = perDoc
      .select(expr(s"(start + nt - 1) div ${cap}L").as("s1"))
      .agg(max("s1")).head().getLong(0)
    assert(lastSeq + 1 == (total + cap - 1) / cap,
      "the concatenated stream leaves no internal padding gaps")
  }

  test("manifest reassembly invariants: contiguous per-doc spans, full sequences, total conservation") {
    val cap = 64L
    val m = SeqPack.seqPackManifest(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perDoc = naive(sf001, cap).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (1) per doc: spans are contiguous from offset 0 and sum to nt
    m.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      assert(sorted.head._3 == 0L, s"doc $doc first span must start at offset 0")
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, s1, o1, l1), (_, s2, o2, _)) =>
          assert(s2 == s1 + 1 && o2 == o1 + l1,
            s"doc $doc spans must be consecutive sequences and contiguous offsets")
        case _ =>
      }
      assert(spans.map(_._4).sum == perDoc(doc), s"doc $doc spans must sum to its tokens")
    }
    // (2) per sequence: every sequence except the last is exactly full
    val bySeq = m.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s != lastSeq) assert(tot == cap, s"sequence $s holds $tot of $cap tokens")
      else assert(tot <= cap && tot > 0)
    }
    // (3) the manifest stays span-sized, not token-sized
    assert(m.length < perDoc.values.sum / 8,
      "manifest volume must be spans, never tokens")
  }

  test("the level-1 window input is |buckets| rows — bounded by the bucket knob, not the corpus") {
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    val nBuckets = spark.read.parquet(s"$sf001/documents.parquet")
      .select(expr("doc_id div 100L").as("b")).distinct().count()
    assert(nBuckets * 50 <= nDocs * 1 + 100,
      s"bucketing must compress the single-partition window input ($nDocs docs -> $nBuckets buckets)")
  }

  test("auto bucketSize keeps BOTH levels ~ sqrt(n) at every id-space size") {
    // the default (bucketSize <= 0) must size from the corpus, so the
    // level-1 window input AND each bucket's cumsum are ~sqrt(n) rows
    // by construction — no fixed knob to outgrow
    for (n <- Seq(100L, 10000L, 25000000L, 4000000000000L)) {
      val bs = SeqPack.autoBucketSize(n)
      val buckets = (n + bs - 1) / bs
      val root = math.sqrt(n.toDouble)
      assert(bs >= root && bs <= root + 1, s"n=$n: bucketSize $bs !~ sqrt = $root")
      assert(buckets <= root + 1, s"n=$n: $buckets buckets exceeds sqrt+1")
    }
    // and the operator actually uses it: with dense ids 0..maxId, the
    // realized bucket count at sf0.01 must be ~sqrt(maxId+1), not n/100
    val maxId = spark.read.parquet(s"$sf001/documents.parquet")
      .agg(max("doc_id")).head().getLong(0)
    val bs = SeqPack.autoBucketSize(maxId + 1)
    val nBuckets = spark.read.parquet(s"$sf001/documents.parquet")
      .select(expr(s"doc_id div ${bs}L").as("b")).distinct().count()
    assert(nBuckets <= math.sqrt((maxId + 1).toDouble) + 1)
  }
}
