package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (pareto frontier) over `part`: the set of parts not
  * dominated on (p_retailprice, p_size) — q dominates p iff q is ≥ on
  * both axes and strictly > on at least one (SURVEY.md §2b; the
  * classic Börzsönyi et al. 2001 operator re-expressed declaratively).
  *
  * Scale shape — the two textbook failure modes are a quadratic
  * NOT-EXISTS self-join and a single-partition global-order window
  * sweep. This implementation has neither:
  *
  *   1. collapse rows to (price → max size) — a hash aggregation whose
  *      output cardinality is |distinct prices|, with map-side combine;
  *   2. range-bucket the price axis into [[Buckets]] fixed-width cells
  *      from a one-row (min, max) aggregate. Every price in a higher
  *      bucket is strictly greater than every price in a lower bucket,
  *      so the dominance sweep splits into an IN-bucket part (a window
  *      partitioned by bucket — parallel across buckets, never a
  *      global sort) and a CROSS-bucket part (a [[Buckets]]-row
  *      suffix-max lookup, broadcast);
  *   3. a price group is on the frontier iff its max size strictly
  *      beats every strictly-higher price's size bound; emitting the
  *      tied rows is one semi-join back to `part` on (price, size).
  *
  * At 100 TB there are exactly TWO full-data passes — the collapse
  * aggregation (checkpointed, so the extent/bucket-bound collects
  * don't re-trigger it) and the tie-emitting semi-join; all other
  * stages operate on distinct-price cardinality. The frontier
  * rule keeps equal-(price, size) twins (neither dominates), drops
  * same-price smaller sizes (dominated via strict size), and drops
  * equal-size lower prices (dominated via strict price).
  */
object Skyline {

  private val Buckets = 64

  def qSkyline(spark: SparkSession, sfDir: String): DataFrame =
    frontierOf(spark,
      spark.read.parquet(s"$sfDir/part.parquet")
        .select(col("p_partkey"), col("p_retailprice").as("price"),
          col("p_size").cast("long").as("size")))

  /** Frontier of any (p_partkey, price: double, size: long) relation. */
  private[queries] def frontierOf(spark: SparkSession, part: DataFrame): DataFrame = {
    // The collapse to (price → max size) runs ONCE and is checkpointed:
    // the extent lookup, the per-bucket bound, and the sweep all read
    // the distinct-price table, not part — without the lineage cut each
    // driver-side collect would re-trigger the full scan (jobs can't
    // share exchanges).
    val groups0 = part.groupBy(col("price"))
      .agg(max("size").as("gmax"))
      .localCheckpoint()

    // One row: price-axis extent for fixed-width bucketing (min/max of
    // the distinct prices == min/max of part).
    val ext = groups0.agg(min("price"), max("price")).collect()(0)
    require(!ext.isNullAt(0), "q_skyline: empty part table — no frontier to compute")
    val (lo, hi) = (ext.getDouble(0), ext.getDouble(1))
    val width = math.max((hi - lo) / Buckets, java.lang.Double.MIN_VALUE)
    val bucketOf = least(floor((col("price") - lit(lo)) / lit(width)),
      lit(Buckets - 1)).cast("int")

    val groups = groups0.withColumn("bucket", bucketOf)

    // Cross-bucket bound: max size over all STRICTLY higher buckets —
    // Buckets rows, suffix-max folded on the driver, broadcast back.
    val perBucket = groups.groupBy("bucket").agg(max("gmax").as("bmax"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val suffix = (0 until Buckets).map { b =>
      val above = (b + 1 until Buckets).flatMap(perBucket.get)
      (b, if (above.isEmpty) Long.MinValue else above.max)
    }
    val crossDf = spark.createDataFrame(suffix).toDF("bucket", "cross_max")

    // In-bucket bound: running max of gmax over strictly-higher prices,
    // windowed PER BUCKET (parallel across buckets; each partition holds
    // only that bucket's distinct prices, not its rows).
    val wb = Window.partitionBy("bucket").orderBy(col("price").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierPrices = groups
      .withColumn("in_max", max("gmax").over(wb))
      .join(broadcast(crossDf), Seq("bucket"))
      .withColumn("bound", greatest(coalesce(col("in_max"), lit(Long.MinValue)), col("cross_max")))
      .filter(col("gmax") > col("bound"))
      .select(col("price"), col("gmax").as("size"))

    // Emit every tied row of each frontier (price, size) cell. No
    // broadcast hint: the frontier is O(log n) expected on independent
    // axes but Θ(distinct prices) worst-case (anti-correlated axes) —
    // AQE broadcasts the measured-small case at runtime.
    part.join(frontierPrices, Seq("price", "size"))
      .select(col("p_partkey"), col("price"), col("size"))
      .orderBy(col("price").desc, col("p_partkey"))
  }
}
