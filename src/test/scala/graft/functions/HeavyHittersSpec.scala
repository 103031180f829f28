package graft.functions

import graft.SparkSpec
import graft.queries.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  test("MG candidates are a superset of every key with freq > n/(k+1)") {
    // Zipf-ish synthetic stream, shuffled so partitions see
    // interleaved keys (the regime where per-partition exact top-k
    // heuristics break but MG's guarantee holds).
    val k = 5
    val keys = (0 until 20000).map { i =>
      if (i % 2 == 0) 1L           // 50%
      else if (i % 4 == 1) 2L      // 25%
      else (i % 997).toLong + 100L // long tail
    }
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(keys.map(Tuple1(_)), 16)
          .map { case Tuple1(x) => org.apache.spark.sql.Row(x) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.LongType))))
      .repartition(16, (rand(seed = 7) * 16).cast("int"))
    val cands = df.agg(GraftFunctions.mg_topk(col("key"), k)).collect()(0).getSeq[Long](0)
    assert(cands.length <= k, s"summary must hold at most $k keys, got ${cands.length}")
    val n = keys.length
    val exact = keys.groupBy(identity).view.mapValues(_.size).toMap
    val mustSurvive = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(mustSurvive.nonEmpty && mustSurvive.subsetOf(cands.toSet),
      s"keys $mustSurvive with freq > n/${k + 1} must survive; candidates were $cands")
  }

  test("two-pass heavy hitters equals the naive full groupBy") {
    val sketch = HeavyHitters.qHeavyHitters(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.queries.Analytics.loadEvents(spark, sf001)
      .select(length(bin((col("event_id") % 65536L) + 1L)).cast("long").as("hk"))
    val n = ev.count()
    val naive = ev.groupBy("hk").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * HeavyHitters.K > n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sketch == naive, s"sketch path $sketch != naive $naive")
    assert(naive.nonEmpty, "planted key must yield heavy hitters")
  }

  test("mg_topk is callable from SQL and matches the Column API") {
    GraftFunctions.register(spark)
    spark.range(0, 1000).select((col("id") % 3L).as("k"))
      .createOrReplaceTempView("mg_spec_keys")
    val viaSql = spark.sql("SELECT mg_topk(k, 2) AS cands FROM mg_spec_keys")
      .collect()(0).getSeq[Long](0)
    val viaCol = spark.table("mg_spec_keys")
      .agg(GraftFunctions.mg_topk(col("k"), 2)).collect()(0).getSeq[Long](0)
    assert(viaSql == viaCol)
    // With frequencies 334/333/333 and k=2, only key 0 (freq > n/3) is
    // GUARANTEED to survive; the summary may legally shrink below k.
    assert(viaSql.contains(0L) && viaSql.length <= 2,
      s"key 0 must survive in a <=2-entry summary: $viaSql")
  }

  test("serialization round-trips and empty input yields an empty summary") {
    val agg = MisraGriesAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 4)
    val buf = agg.createAggregationBuffer()
    buf(42L) = 7L; buf(-3L) = 2L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toMap == Map(42L -> 7L, -3L -> 2L))
    val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.LongType))))
    val cands = empty.agg(GraftFunctions.mg_topk(col("key"), 4)).collect()(0).getSeq[Long](0)
    assert(cands.isEmpty)
  }
}
