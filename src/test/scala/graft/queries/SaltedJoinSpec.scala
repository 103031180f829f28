package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed fact table") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("dk", "name")

    val plain = fact.join(dim, fact("k") === dim("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = SaltedJoin.join(fact, dim, fact("k"), dim("dk"), salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(salted == plain, s"salted=$salted plain=$plain")
    assert(plain("hot")._1 == 1800L)
  }

  test("the hot key spreads over multiple salt values") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (42L, i)).toDF("k", "v")
    val spread = fact
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8)))
      .groupBy("__salt").count().collect()
    assert(spread.length > 1, "salting must split the hot key across partitions")
  }
}
