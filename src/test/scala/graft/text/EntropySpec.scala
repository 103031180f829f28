package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntropySpec extends SparkSpec {

  test("bits_floor equals the exact BigInt replay: sum of c*floor(log2(n/c))") {
    val out = Entropy.textEntropy(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase)
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val counts = text.toCharArray.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val bits = counts.map(c => c * (63 - java.lang.Long.numberOfLeadingZeros(n / c))).sum
      val milli = 1000L * bits / n
      assert(out(id) == ((n, bits, milli)),
        s"doc $id: engine ${out(id)} != replay ($n, $bits, $milli)")
    }
  }

  test("a planted single-char flood is flagged low-entropy; natural prose is not") {
    import spark.implicits._
    val planted = Seq((1L, "x" * 500), (2L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    planted.write.mode("overwrite").parquet("/tmp/graft-entropy-plant/documents.parquet")
    val out = Entropy.textEntropy(spark, "/tmp/graft-entropy-plant").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L)._1 == 0L && out(1L)._2,
      s"single-char flood has zero entropy and must flag: ${out(1L)}")
    assert(out(2L)._1 > 3000L && !out(2L)._2,
      s"pangram-ish prose sits well above the gate: ${out(2L)}")
  }

  test("plan: two map-side-combined aggregates, no window, no sort over chars") {
    val p = Entropy.textEntropy(spark, sf0001).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum") ||
      "HashAggregate.*partial".r.findFirstIn(p).isDefined,
      s"char counts must combine map-side:\n$p")
    // the one allowed range exchange is the |docs|-row output orderBy
    // (the oracle-stability convention every 31x row follows)
    assert(!p.contains("rangepartitioning(ch"),
      s"no sort exchange over the exploded chars:\n$p")
  }
}
