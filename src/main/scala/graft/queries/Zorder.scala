package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering layout + measured data skipping
  * (SURVEY.md §2b) — the storage-layout axis `q_dpp` covers for
  * partition DIRECTORIES, applied to row-group statistics instead:
  * multi-column box queries over a table too fine-grained to
  * directory-partition.
  *
  * A single-column sort gives min/max file stats that prune on that
  * column only; interleaving the bits of BOTH join/filter keys
  * (Morton code) makes every file's (l_suppkey, l_partkey) bounding
  * box compact, so a box predicate on either or both columns skips
  * most row groups via plain parquet min/max stats — no index, no
  * extra metadata, the 100 TB data-skipping idiom (Delta/Iceberg
  * OPTIMIZE ZORDER). The z value is pure bitwise Column arithmetic
  * (codegen, exact); clustering is semantically invisible, so the
  * oracle is the same box aggregate over the unclustered table.
  *
  * The clustered copy is (re)written by the query itself into a
  * deterministic per-user dir — same amortized-write discipline as
  * `Dpp.writePartitionedFact`.
  */
object Zorder {

  /** Spread the low 32 bits of x so input bit i lands at output bit
    * 2i (the classic magic-number dilation).
    */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton interleave of two non-negative ints < 2^31. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  private def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_partkey", "l_extendedprice", "l_discount")

  private def outDir(sfDir: String, tag: String): String =
    graft.util.TempDirs.forInput(sfDir, tag)

  /** Writes (overwrite) the z-clustered copy and returns its path:
    * range-partition on z so each of the 32 output files covers a
    * compact z interval — i.e. a compact (suppkey, partkey) box.
    */
  def writeZClustered(spark: SparkSession, sfDir: String): String = {
    val out = outDir(sfDir, "zorder")
    lineitem(spark, sfDir)
      .withColumn("z", zValue(col("l_suppkey"), col("l_partkey")))
      .repartitionByRange(32, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 20000)
      .parquet(out)
    out
  }

  /** Spec-only contrast layout: same data, hash-shuffled — every file
    * spans the full key range, so min/max stats prune nothing.
    */
  def writeHashShuffled(spark: SparkSession, sfDir: String): String = {
    val out = outDir(sfDir, "zhash")
    lineitem(spark, sfDir)
      .repartition(32)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 20000)
      .parquet(out)
    out
  }

  /** Deterministic mid-range box bounds (quarter-to-half of each key
    * range, exact integer division — the oracle recomputes them with
    * scalar subqueries).
    */
  def boxBounds(spark: SparkSession, sfDir: String): (Long, Long, Long, Long) = {
    val r = lineitem(spark, sfDir).agg(max("l_suppkey"), max("l_partkey")).head()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"q_zorder: empty lineitem at $sfDir — no box bounds to derive")
    val (sMax, pMax) = (r.getLong(0), r.getLong(1))
    (sMax / 4, sMax / 2, pMax / 4, pMax / 2)
  }

  /** Box aggregate over an arbitrary layout of the lineitem copy. */
  def boxQuery(spark: SparkSession, path: String,
               bounds: (Long, Long, Long, Long)): DataFrame = {
    val (sLo, sHi, pLo, pHi) = bounds
    spark.read.parquet(path)
      .filter(col("l_suppkey") > sLo && col("l_suppkey") <= sHi &&
        col("l_partkey") > pLo && col("l_partkey") <= pHi)
      .agg(
        count(lit(1)).as("n_items"),
        Analytics.moneyRevenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  def qZorder(spark: SparkSession, sfDir: String): DataFrame =
    boxQuery(spark, writeZClustered(spark, sfDir), boxBounds(spark, sfDir))
}
