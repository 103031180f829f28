package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bag-semantics set operations (SURVEY.md §2b) — EXCEPT ALL /
  * INTERSECT ALL, the MULTISET twins of `q_setops`' set-semantics
  * INTERSECT/EXCEPT: multiplicity survives (a customer with 5 open
  * orders and 2 filled ones contributes max(5−2,0)=3 rows to the
  * difference and min(5,2)=2 to the intersection). SQL's ALL variants
  * are the correct tool whenever the rows ARE occurrences (order
  * events) rather than identities.
  *
  * Scale shape: Catalyst rewrites both (RewriteExceptAll /
  * RewriteIntersectAll) into union-with-tag → one count aggregate
  * keyed on the VALUE → Generate replicating each value
  * max(m₁−m₂,0)/min(m₁,m₂) times — one value-keyed shuffle, no join
  * of the two branches, no nested loop (spec pins Generate present,
  * Join absent). Output is the census of each result bag (rows,
  * distinct customers, key sum) so the artifact stays small while
  * pinning the whole multiset.
  */
object BagSetOps {

  def qExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val a = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val b = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    def census(df: DataFrame, op: String) =
      df.agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          coalesce(sum("o_custkey"), lit(0L)).as("key_sum"))
        .select(lit(op).as("op"), col("n"), col("n_cust"), col("key_sum"))
    census(a.exceptAll(b), "except_all")
      .unionByName(census(a.intersectAll(b), "intersect_all"))
      .orderBy("op")
  }

  val oracleSql: String =
    """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |ex AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
      |ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  CAST(coalesce(sum(o_custkey), 0) AS BIGINT) AS key_sum FROM ex
      |UNION ALL
      |SELECT 'intersect_all', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT o_custkey) AS BIGINT),
      |  CAST(coalesce(sum(o_custkey), 0) AS BIGINT) FROM ia
      |ORDER BY op""".stripMargin
}
