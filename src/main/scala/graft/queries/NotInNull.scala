package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** NOT IN three-valued NULL semantics (SURVEY.md §2b) — the classic
  * SQL correctness trap, pinned as a same-SQL-text row (the
  * `q_exists_subquery` discipline): `x NOT IN (subquery)` is
  * `x <> v₁ AND x <> v₂ AND …`, and ONE NULL in the list makes every
  * conjunct UNKNOWN-at-best, so the predicate can never be TRUE — the
  * whole result silently collapses to empty. The row computes, in one
  * SQL text both engines run verbatim:
  *
  *   - n_not_in_clean: NOT IN against a NULL-free list (the intended
  *     anti-join),
  *   - n_not_in_nullable: the same list with NULLs planted every
  *     1000th order — MUST be 0 in any ANSI engine,
  *   - n_not_exists: the NULL-proof formulation, which must equal the
  *     clean NOT IN count.
  *
  * Scale note (the lesson the row teaches): Spark plans nullable
  * NOT IN as a NULL-AWARE anti join, which is broadcast-only — the
  * list side must fit on every executor, because each row needs to
  * see the whole list to decide UNKNOWN. `NOT EXISTS` decorrelates to
  * a shuffled left-anti hash join with no such constraint. At 100 TB:
  * write NOT EXISTS (or prove the column NOT NULL); this row keeps
  * the engine's semantics honest for users who write NOT IN anyway.
  */
object NotInNull {

  /** "Customers with no big order" — the price filter keeps the anti
    * join non-trivial (every customer has SOME order in this data).
    */
  def sql(customer: String, orders: String): String =
    s"""SELECT
       |  (SELECT count(*) FROM $customer
       |   WHERE c_custkey NOT IN (
       |     SELECT o_custkey FROM $orders WHERE o_totalprice > 300000)) AS n_not_in_clean,
       |  (SELECT count(*) FROM $customer
       |   WHERE c_custkey NOT IN (
       |     SELECT o_custkey FROM $orders WHERE o_totalprice > 300000
       |     UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_not_in_nullable,
       |  (SELECT count(*) FROM $customer c
       |   WHERE NOT EXISTS (SELECT 1 FROM $orders o
       |                     WHERE o.o_custkey = c.c_custkey
       |                       AND o.o_totalprice > 300000)) AS n_not_exists""".stripMargin

  def qNotInNull(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"))) { v =>
      spark.sql(sql(v("customer"), v("orders")))
    }
}
