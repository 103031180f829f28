package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom has NO false negatives and a bounded false-positive rate") {
    val keys = (0L until 5000L).map(k => k * 7919L + 13L)
    val ds = spark.createDataset(keys.map(java.lang.Long.valueOf))(Encoders.LONG)
    val bits = BloomSketch.build(ds, keys.length.toLong)
    keys.foreach { k =>
      assert(BloomSketch.mightContain(bits, k), s"false negative on $k")
    }
    // Disjoint probe set: fp target is 1%; assert a loose 3% bound so
    // the test is variance-proof while still catching a broken hash.
    val probes = (0L until 20000L).map(k => k * 104729L + 1L).filterNot(keys.toSet)
    val fp = probes.count(BloomSketch.mightContain(bits, _))
    assert(fp.toDouble / probes.size < 0.03,
      s"false-positive rate ${fp.toDouble / probes.size} exceeds 3%")
  }

  test("codegen probe agrees with the interpreted probe on every key") {
    val keys = (0L until 512L).map(k => BloomSketch.mix64(k) >>> 8)
    val ds = spark.createDataset(keys.map(java.lang.Long.valueOf))(Encoders.LONG)
    val bits = BloomSketch.build(ds, keys.length.toLong)
    val mixed = spark.range(0, 4096).select((col("id") * 37L).as("k"))
    val viaExpr = mixed
      .withColumn("hit", GraftFunctions.bloom_might_contain(bits, col("k")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    mixed.collect().map(_.getLong(0)).foreach { k =>
      assert(viaExpr(k) == BloomSketch.mightContain(bits, k),
        s"codegen/interpreted divergence on key $k")
    }
  }

  test("the runtime filter actually thins the fact side at the join") {
    // Urgent orders are ~1/5 of the dim; the bloom-surviving fact
    // fraction must sit near that, far below 1.0 — otherwise the
    // pre-shuffle filter is decorative.
    val urgent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bits = BloomSketch.build(
      urgent.select(col("o_orderkey")).as(Encoders.LONG), urgent.count())
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val total = li.count()
    val surviving = li.filter(
      GraftFunctions.bloom_might_contain(bits, col("l_orderkey"))).count()
    assert(surviving < total * 0.35,
      s"bloom kept $surviving of $total fact rows — filter is not selective")
    val exact = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    assert(surviving >= exact, "bloom can never drop a true match")
  }

  test("empty build side rejects everything except hash-floor collisions") {
    val ds = spark.createDataset(Seq.empty[java.lang.Long])(Encoders.LONG)
    val bits = BloomSketch.build(ds, 0L)
    assert(bits.forall(_ == 0L), "empty build must set no bits")
    assert(!(0L until 1000L).exists(BloomSketch.mightContain(bits, _)))
  }
}
