package graft.svm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SvmScaleSpec extends SparkSpec {

  test("scaled sample matches an exact per-row recomputation, bounded by [-1,1]") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dims = e.head._2.length
    val lo = Array.tabulate(dims)(d => e.map(_._2(d).toDouble).min)
    val hi = Array.tabulate(dims)(d => e.map(_._2(d).toDouble).max)
    def expect(x: Double, d: Int): Double = {
      val raw = if (hi(d) == lo(d)) 0.0 else (x - lo(d)) * 2.0 / (hi(d) - lo(d)) - 1.0
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = SvmScale.svmScale(spark, sf001).collect()
    assert(rows.length == e.count(_._1 % 50 == 0) * dims)
    rows.foreach { r =>
      val (id, d, x, s) = (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))
      val raw = e.find(_._1 == id).get._2(d).toDouble
      assert(s == expect(raw, d), s"vec $id dim $d")
      assert(s >= -1.0 && s <= 1.0)
      assert(x == BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("constant dimension scales to 0.0, extremes to the interval ends") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 5.0f)),
      (50L, Array(1.0f, 7.0f)),
      (100L, Array(1.0f, 6.0f))).toDF("vec_id", "embedding")
    val got = SvmScale.scaleOf(df).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got((0L, 0)) == 0.0 && got((50L, 0)) == 0.0 && got((100L, 0)) == 0.0)
    assert(got((0L, 1)) == -1.0)
    assert(got((50L, 1)) == 1.0)
    assert(got((100L, 1)) == 0.0)
  }
}
