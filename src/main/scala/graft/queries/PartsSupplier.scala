package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q16 shape (SURVEY.md §2b) — "parts/supplier relationship":
  * a DISTINCT-count of suppliers per part attribute bucket, with the
  * three-way part prefilter (brand ≠, type NOT LIKE, size IN-list)
  * and the NOT IN exclusion of a sub-selected supplier set
  * ("customers complained" → here: low-balance suppliers,
  * s_acctbal < 2500 — a threshold the corpus populates at EVERY
  * scale factor, so the anti join is never vacuous). The shape
  * combines two planner tests in one text:
  *
  *  - NOT IN over a subquery must become a null-aware ANTI join
  *    (the 20al4 / `q_not_in_null` lesson as a JOIN component, not
  *    the headline), never a per-row re-execution;
  *  - count(DISTINCT supplier) per group needs the two-phase
  *    distinct-aggregate expansion — dedup on (group, supplier),
  *    then count — NOT a per-group hash-set that concentrates a hot
  *    brand/type/size bucket's suppliers on one task.
  *
  * Corpus adaptation: no partsupp table — the part↔supplier relation
  * is lineitem's (l_partkey, l_suppkey) pairs, the same relation
  * observed through the fact (distinct-count semantics identical,
  * input just carries duplicates — which is exactly what makes the
  * distinct expansion load-bearing). All counts are pure integers:
  * zero rounding surface. At 100 TB the part prefilter broadcasts,
  * the tiny excluded-supplier list broadcasts into the anti join,
  * and only (group-key, suppkey) pairs shuffle. DuckDB runs the
  * SAME SQL text.
  */
object PartsSupplier {

  def sql(lineitem: String, part: String, supplier: String): String =
    s"""SELECT p.p_brand, p.p_type, p.p_size,
       |  count(DISTINCT l.l_suppkey) AS supplier_cnt
       |FROM $lineitem l, $part p
       |WHERE p.p_partkey = l.l_partkey
       |  AND p.p_brand <> 'Brand#13'
       |  AND p.p_type NOT LIKE 'MEDIUM%'
       |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
       |  AND l.l_suppkey NOT IN (
       |    SELECT s_suppkey FROM $supplier WHERE s_acctbal < 2500)
       |GROUP BY p.p_brand, p.p_type, p.p_size
       |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin

  def qPartsSupplier(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("part"), v("supplier")))
    }
}
