package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q19-shaped "discounted revenue" (SURVEY.md §2b): the classic
  * DISJUNCTION-OF-CONJUNCTIONS join predicate — three OR'd branches,
  * each repeating the `p_partkey = l_partkey` equi condition alongside
  * its own brand/size/quantity ranges, exactly as the spec writes it.
  * The planner test the shape exists for: the optimizer must FACTOR
  * the common equi conjunct out of the disjunction (CNF conversion) so
  * the join stays a hash join with the branch ranges as a residual
  * filter — the naive reading is a nested-loop join over
  * |lineitem|×|part|, the difference between seconds and days at
  * 100 TB. PlanAuditSpec pins the hash join and the absence of any
  * loop join.
  *
  * Money in exact integer units (cents × discount-percent), one final
  * IEEE division — the one-text oracle discipline; DuckDB factors the
  * same disjunction with its own optimizer and must produce the same
  * single revenue row.
  */
object DisjunctiveJoin {

  def sql(lineitem: String, part: String): String =
    s"""SELECT CAST(sum(
       |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
       |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
       |  ) AS DOUBLE) / 10000 AS revenue,
       |  CAST(count(*) AS BIGINT) AS n_items
       |FROM $lineitem l, $part p
       |WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
       |    AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       |   OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#2'
       |    AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       |   OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
       |    AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin

  def qDisjunctiveJoin(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("part")))
    }
}
