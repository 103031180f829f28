package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorrSpec extends SparkSpec {

  test("slope/corr match a driver-side BigInt brute force") {
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity") + lit(0.5)).cast("long"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (BigInt(r.getLong(2)), BigInt(r.getLong(3)))))
    val expect = rows.groupBy(_._1).map { case (g, xs) =>
      val (x, y) = xs.map(_._2).unzip
      val n = BigInt(x.length)
      val (sx, sy) = (x.sum, y.sum)
      val cov = n * x.zip(y).map { case (a, b) => a * b }.sum - sx * sy
      val varx = n * x.map(a => a * a).sum - sx * sx
      val vary = n * y.map(a => a * a).sum - sy * sy
      val corr = cov.toDouble / (math.sqrt(varx.toDouble) * math.sqrt(vary.toDouble))
      g -> (x.length.toLong, sx.toLong, sy.toLong,
        (cov * 1000000 / varx).toLong, math.rint(corr * 1e6) / 1e6)
    }
    val got = Corr.qCorr(spark, sf0001).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
    }.toMap
    assert(got.keySet == expect.keySet)
    for ((g, e) <- expect) {
      val o = got(g)
      assert((o._1, o._2, o._3, o._4) == (e._1, e._2, e._3, e._4),
        s"exact integer stats must match for $g: got $o expected $e")
      assert(math.abs(o._5 - e._5) < 2e-6, s"corr for $g: got ${o._5} expected ${e._5}")
    }
  }

  test("sufficient-stat results are partitioning-invariant (exact, unlike built-in corr)") {
    val a = Corr.qCorr(spark, sf0001).collect().toSeq
    var b: Seq[org.apache.spark.sql.Row] = Nil
    withSQLConf("spark.sql.shuffle.partitions" -> "11") {
      b = Corr.qCorr(spark, sf0001).collect().toSeq
    }
    assert(a == b)
  }

  test("decimal sufficient stats have sf1-scale headroom (no silent overflow-to-null)") {
    // Σy² at sf1 ≈ 6e20 > int64: the decimal(38,0) path must carry it.
    // Simulate by scaling prices 1000× at sf0.001 — Σy² grows 1e6×,
    // well past int64 — and assert non-null exact outputs.
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("corr_big").toString
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("l_extendedprice", col("l_extendedprice") * 1000)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val out = Corr.qCorr(spark, dir).collect()
    assert(out.nonEmpty && out.forall(r => !r.isNullAt(5) && !r.isNullAt(6)),
      "scaled-up corpus must not overflow the decimal sums")
  }
}
