package graft.queries

import graft.SparkSpec

class NotInNullSpec extends SparkSpec {

  test("one planted NULL empties NOT IN; NOT EXISTS equals the clean anti join") {
    val r = NotInNull.qNotInNull(spark, sf0001).collect().head
    val (clean, nullable, notExists) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nullable == 0L,
      "ANSI three-valued logic: a NULL in the list means NOT IN can never be TRUE")
    assert(clean == notExists, "NULL-free NOT IN and NOT EXISTS are the same anti join")
    assert(clean > 0L, "the planted key space must leave some customers orderless")
  }

  test("plan: nullable NOT IN becomes a null-aware anti join, NOT EXISTS a plain left anti") {
    // subquery physical plans only materialize on execution — pin the
    // optimized logical plan, where the decorrelation shape is decided
    val plan = NotInNull.qNotInNull(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti joins in:\n$plan")
    // the NULL-aware signature: the anti-join condition carries the
    // UNKNOWN arm ((k = v) OR isnull(k = v)) — the broadcast-only
    // form; the clean and NOT EXISTS variants must NOT have it
    assert("""LeftAnti, \(\([^\n]*\) OR isnull""".r.findFirstIn(plan).isDefined,
      s"nullable NOT IN must keep the three-valued OR-isnull arm:\n$plan")
    assert("""LeftAnti, \(o_custkey#\d+L? = c_custkey#\d+L?\)""".r.findFirstIn(plan).isDefined
      || """LeftAnti, \(c_custkey#\d+L? = o_custkey#\d+L?\)""".r.findFirstIn(plan).isDefined,
      s"NOT EXISTS / clean NOT IN must stay a plain equality anti join:\n$plan")
  }
}
