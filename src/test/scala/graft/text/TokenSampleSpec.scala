package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenSampleSpec extends SparkSpec {

  test("systematic picks equal the driver replay; every stratum covered") {
    val out = TokenSample.corpusSampleTokens(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet.size == 20, "every source yields picks")

    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = toks.groupBy(_._1).map { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      val w = ordered.map(_._3).sum
      var cum = 0L
      val picked = ordered.flatMap { case (_, id, nt) =>
        val prev = cum; cum += nt
        if (cum * 50 / w > prev * 50 / w) Some((id, nt)) else None
      }
      src -> (picked.length.toLong, picked.map(_._2).sum, picked.map(_._1).sum)
    }
    assert(out == expected, "picks must equal the exact systematic replay")

    // the crossing argument: never more than K picks, and exactly K
    // unless a single doc spans >= 2 multiples of W/K
    out.foreach { case (src, (n, _, _)) =>
      assert(n >= 1 && n <= 50, s"$src pick count must sit in [1, K]")
    }
    // length bias is real: picked docs are on average longer than the corpus mean
    val meanAll = toks.map(_._3).sum.toDouble / toks.length
    val (pickedN, pickedToks) = (out.values.map(_._1).sum, out.values.map(_._2).sum)
    assert(pickedToks.toDouble / pickedN > meanAll,
      "∝-token sampling must over-select long documents")
  }
}
