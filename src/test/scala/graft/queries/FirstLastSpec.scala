package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FirstLastSpec extends SparkSpec {

  test("positional answers equal the sorted driver replay, nulls skipped") {
    val out = FirstLast.qFirstLast(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap

    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).map { case (c, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val cents = sorted.map(_._4)
      val usable = sorted.collect { case (_, k, _, v) if k % 5 != 0 => v }
      c -> (cents.head, cents.last,
        if (cents.length >= 2) Some(cents(1)) else None,
        usable.headOption)
    }
    assert(out == expected, "first/last/nth/ignore-nulls must equal the replay")

    // the traps are exercised: someone's last differs from first, someone's
    // first order has a planted-null price (so IGNORE NULLS skipped a row)
    assert(out.exists { case (_, (f, l, _, _)) => f != l })
    val firstKeyNulled = rows.groupBy(_._1).exists { case (_, rs) =>
      rs.minBy(r => (r._3, r._2))._2 % 5 == 0
    }
    assert(firstKeyNulled, "some customer's FIRST order must carry a planted null")
  }

  test("plan: all four positional functions share one Window over one exchange") {
    val p = FirstLast.qFirstLast(spark, sf0001).queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"one customer exchange must feed everything, got $hashExchanges:\n$p")
    assert("Window".r.findAllIn(p).size <= 2, // full-frame window + row_number window share the sort
      s"positional family must not multiply Window passes:\n$p")
  }
}
