package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting — the manual counterpart to
  * AQE's skew-join splitting, for when a handful of hot keys would pin
  * a shuffle partition (the classic 100 TB failure mode: one executor
  * processes the one key that is 30% of the fact table).
  *
  * The fact side gets a random salt in [0, R); the dimension side is
  * replicated R ways; the join key becomes (key, salt), spreading each
  * hot key over R shuffle partitions. Replication cost is R×|dim| —
  * use only when dim is small relative to the skew being dissolved
  * (otherwise prefer broadcast or AQE).
  */
object SaltedJoin {

  def join(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
           salts: Int = 8): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        factKey === dimKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
