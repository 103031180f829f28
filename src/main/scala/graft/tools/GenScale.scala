package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the driver's sf0.1 tables → an sf1
  * dataset under the REPO (never touches /root/testdata), for scaling-
  * slope evidence: every copy `c` of a row gets keys offset by
  * `c · rows(table)` so ids stay dense/contiguous, id-arithmetic
  * densities (every %k planting rule) are preserved, and each copy's
  * star-schema joins close within the copy — aggregate group counts,
  * join fan-outs and filter selectivities all scale exactly linearly,
  * which is what a slope measurement needs.
  *
  * Two tables are value-perturbed so the scale-up cannot manufacture
  * degenerate duplicate structure the real corpus wouldn't have:
  *   - documents: every token of copy c ≥ 1 gets a `~c` suffix
  *     (vocabularies of different copies are disjoint → shingle
  *     Jaccard across copies is 0 → near-dup pipelines see the same
  *     planted-only pair structure as sf0.1, 10× over; n_chars is
  *     recomputed from the new text).
  *   - embeddings: copies add deterministic per-(id, dim) hash noise of
  *     ±0.15 (≈ half the component scale) so no cross-copy pair lands
  *     at cosine 1.0 and the planted exact-duplicate contracts keep
  *     their unique answers.
  * nation/region are TPC-H-fixed (25/5 rows at every sf) and are
  * copied verbatim.
  */
object GenScale {

  val Copies = 10

  private def replicate(d: DataFrame, copies: Int): DataFrame =
    d.withColumn("c", explode(array((0 until copies).map(lit): _*)))

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "testdata-sf1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, d: DataFrame): Unit = {
      d.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"GENSCALE $name rows=${spark.read.parquet(s"$out/$name.parquet").count()}")
    }

    write("region", t("region"))
    write("nation", t("nation"))

    val nCust = t("customer").count()
    val nSupp = t("supplier").count()
    val nPart = t("part").count()
    val nOrd = t("orders").count()
    write("customer", replicate(t("customer"), Copies)
      .withColumn("c_custkey", col("c_custkey") + col("c") * nCust).drop("c"))
    write("supplier", replicate(t("supplier"), Copies)
      .withColumn("s_suppkey", col("s_suppkey") + col("c") * nSupp).drop("c"))
    write("part", replicate(t("part"), Copies)
      .withColumn("p_partkey", col("p_partkey") + col("c") * nPart).drop("c"))
    write("orders", replicate(t("orders"), Copies)
      .withColumn("o_orderkey", col("o_orderkey") + col("c") * nOrd)
      .withColumn("o_custkey", col("o_custkey") + col("c") * nCust).drop("c"))
    write("lineitem", replicate(t("lineitem"), Copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("c") * nOrd)
      .withColumn("l_partkey", col("l_partkey") + col("c") * nPart)
      .withColumn("l_suppkey", col("l_suppkey") + col("c") * nSupp).drop("c"))

    val nEvent = t("events").count()
    val nUser = t("events").agg(max("user_id")).head().getLong(0) + 1
    // events.ts passes through at micros precision whatever the source
    // generation: TIMESTAMP_NTZ micros (current driver data) replicates
    // verbatim, while legacy TIMESTAMP(NANOS) — readable only as long
    // nanos, unwritable by Spark — is re-emitted as micros (`div 1000`
    // truncates exactly like the engine's read path). Either way the
    // DuckDB oracle SQL (date_trunc on TIMESTAMP) consumes sf1 events
    // natively, so the event-time query family oracle-verifies at sf1
    // instead of being bench-only.
    val tsMicros =
      if (t("events").schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts")
    write("events", replicate(t("events"), Copies)
      .withColumn("event_id", col("event_id") + col("c") * nEvent)
      .withColumn("user_id", col("user_id") + col("c") * nUser)
      .withColumn("ts", tsMicros).drop("c"))

    val nDoc = t("documents").count()
    write("documents", replicate(t("documents"), Copies)
      .withColumn("doc_id", col("doc_id") + col("c") * nDoc)
      .withColumn("text",
        when(col("c") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~"), col("c").cast("string")))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("c"))

    val nVec = t("embeddings").count()
    // noise keyed by (FINAL id, dim): final ids are unique within a
    // generation AND across chained generations' noised ranges, so no
    // two noised vectors ever share (base, noise). The earlier key
    // (ORIGINAL vec_id, dim, c) collided generation-over-generation:
    // sf0.1→sf1's copy-1 of vector 0 (id 2000, key (0,i,1)) and
    // sf1→sf10's copy-1 of vector 0 (id 20000, SAME key (0,i,1)) got
    // identical noise on the identical base — manufacturing exactly
    // the unplanned cosine-1.0 duplicates the noise exists to prevent
    // (caught by the r14 sf10 oracle sweep: ann_ivf_pq's tie-break
    // returned the accidental twin instead of the planted one).
    val noise = transform(col("embedding"), (x, i) =>
      (x.cast("double") + when(col("c") === 0, lit(0.0)).otherwise(
        (pmod(xxhash64(col("vec_id") + col("c") * nVec, i), lit(1001L)).cast("double") - 500.0)
          / 500.0 * 0.15))
        .cast("float"))
    write("embeddings", replicate(t("embeddings"), Copies)
      .withColumn("embedding", noise)
      .withColumn("vec_id", col("vec_id") + col("c") * nVec)
      .drop("c"))

    spark.stop()
  }
}
