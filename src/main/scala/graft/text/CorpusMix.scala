package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture rebalancing — downsample a corpus so the per-language (or
  * per-domain) shares hit a TARGET mixture, the knob every LLM
  * training-data recipe turns (e.g. "40% en / fixed slices of the
  * rest" regardless of what was crawled).
  *
  * Semantics: the achievable total under target weights w_l is
  * T = min_l(n_l / w_l) — the limiting stratum is kept whole and every
  * other stratum is downsampled to rate_l = w_l·T / n_l. Membership is
  * the same doc_id LCG as [[CorpusShard.split]] (pure integer
  * arithmetic, engine-independent), so the sample is deterministic,
  * reproducible across engines and re-runs, and NEEDS NO per-row
  * coordination: realized counts are binomial around w_l·T rather than
  * exact-k, which is the 100 TB-correct trade — exact-k per stratum
  * would need a per-stratum sort/rank of the full corpus, this needs
  * one scan and a 5-row broadcast.
  *
  * The whole computation is declarative: per-stratum counts → tiny
  * rate frame (strata × 1 row; the only "driver-side" object is the
  * weight literal list) → broadcast hash semi-join against the scan.
  */
object CorpusMix {

  /** Target mixture. en is deliberately the limiting stratum at the
    * test corpus' natural shares (~0.40 en), so the contract exercises
    * both the kept-whole and the downsampled paths.
    */
  val Weights: Seq[(String, Double)] =
    Seq(("de", 0.10), ("en", 0.50), ("es", 0.20), ("fr", 0.10), ("zh", 0.10))

  import CorpusShardLcg.{SplitA, SplitC, SplitM}

  /** Per-language mix audit: n_before, kept count, target vs realized
    * share. `h < floor(rate·2^31)` with the mod-2^31-before-multiply
    * LCG — every number SQL-reproducible.
    */
  def mix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val w = Weights.toDF("lang", "w")
    // rates: strata-count frame (|langs| rows) — window over it is free
    val rates = d.groupBy("lang").agg(count(lit(1)).as("n_before"))
      .join(w, "lang")
      .withColumn("t_max",
        min(col("n_before").cast("double") / col("w")).over(Window.partitionBy()))
      .withColumn("rate",
        least(lit(1.0), col("w") * col("t_max") / col("n_before")))
      .withColumn("thresh", floor(col("rate") * SplitM).cast("long"))
    val h = pmod(pmod(col("doc_id"), lit(SplitM)) * SplitA + SplitC, lit(SplitM))
    val kept = d.withColumn("h", h)
      .join(broadcast(rates.select("lang", "thresh")), "lang")
      .filter(col("h") < col("thresh"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, "lang")
      .withColumn("total_kept", sum("n_kept").over(Window.partitionBy()))
      .select(col("lang"), col("n_before"), col("n_kept"),
        (floor(col("w") * 10000 + 0.5) / 10000).as("target_share"),
        (floor(col("n_kept").cast("double") / col("total_kept") * 10000 + 0.5) / 10000)
          .as("realized_share"))
      .orderBy("lang")
  }

  /** Upsampling repeat-factor frame: T = MAX_l(n_l / w_l) makes the
    * most over-represented stratum the anchor (seen exactly once) and
    * gives every other stratum a repeat factor r_l = w_l·T / n_l ≥ 1 —
    * "2.3 epochs of de". `greatest(1.0, …)` clamps the anchor's own
    * ratio against last-ulp IEEE drift (w·(n/w)/n can land a hair
    * under 1.0; both engines clamp identically). floor(r) full epochs,
    * the fractional epoch thinned by the same LCG membership.
    */
  private def upRates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = Weights.toDF("lang", "w")
    docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      .join(w, "lang")
      .withColumn("t_max",
        max(col("n_before").cast("double") / col("w")).over(Window.partitionBy()))
      .withColumn("r", greatest(lit(1.0), col("w") * col("t_max") / col("n_before")))
      .withColumn("k_full", floor(col("r")))
      .withColumn("thresh",
        floor((col("r") - floor(col("r"))) * SplitM).cast("long"))
  }

  /** Per-language UPSAMPLING audit (`corpus_mix_up`): n_before, total
    * emitted rows (full epochs + LCG-thinned fractional epoch), the
    * realized repeat factor, and target vs realized share. One corpus
    * scan + a 5-row broadcast — sum(k_full) over a stratum's rows IS
    * n_before·k_full, so full and fractional epochs are counted in the
    * same aggregate without materializing a single copy.
    */
  def mixUp(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val rates = upRates(d)
    val h = pmod(pmod(col("doc_id"), lit(SplitM)) * SplitA + SplitC, lit(SplitM))
    val emitted = d.withColumn("h", h)
      .join(broadcast(rates.select("lang", "k_full", "thresh")), "lang")
      .groupBy("lang")
      .agg((sum(col("k_full")) +
        sum(when(col("h") < col("thresh"), 1L).otherwise(0L))).as("n_emitted"))
    rates.join(emitted, "lang")
      .withColumn("total", sum("n_emitted").over(Window.partitionBy()))
      .select(col("lang"), col("n_before"), col("n_emitted"),
        (floor(col("r") * 10000 + 0.5) / 10000).as("epochs"),
        (floor(col("w") * 10000 + 0.5) / 10000).as("target_share"),
        (floor(col("n_emitted").cast("double") / col("total") * 10000 + 0.5) / 10000)
          .as("realized_share"))
      .orderBy("lang")
  }

  /** The upsampled corpus itself (library surface): every kept doc with
    * DETERMINISTIC per-epoch copies — copy e of a doc carries
    * `doc_id + e·EpochOffset`, so repeats are addressable, reproducible
    * across engines/re-runs, and id-disjoint from the originals (the
    * id-space discipline every planted operator already uses). The
    * fractional final epoch keeps docs whose LCG value clears the
    * stratum threshold. No shuffle: explode(sequence) over one scan
    * against the broadcast rate frame.
    */
  def upsampled(docs: DataFrame): DataFrame = {
    val rates = upRates(docs)
    val h = pmod(pmod(col("doc_id"), lit(SplitM)) * SplitA + SplitC, lit(SplitM))
    docs
      .join(broadcast(rates.select("lang", "k_full", "thresh")), "lang")
      .withColumn("epoch", explode(sequence(lit(0L), col("k_full").cast("long"))))
      .filter(col("epoch") < col("k_full") || h < col("thresh"))
      .withColumn("doc_id", col("doc_id") + col("epoch") * lit(EpochOffset))
      .drop("k_full", "thresh", "epoch")
  }

  /** Epoch id stride for [[upsampled]] copies — far above every
    * PlantOffset multiple the planted operators use.
    */
  val EpochOffset: Long = 100L * graft.dedup.Dedup.PlantOffset

  /** The sampled corpus itself (library surface): every column of the
    * kept docs, deterministic membership.
    */
  def sampled(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = Weights.toDF("lang", "w")
    val rates = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      .join(w, "lang")
      .withColumn("t_max",
        min(col("n_before").cast("double") / col("w")).over(Window.partitionBy()))
      .withColumn("thresh",
        floor(least(lit(1.0), col("w") * col("t_max") / col("n_before")) * SplitM)
          .cast("long"))
      .select("lang", "thresh")
    val h = pmod(pmod(col("doc_id"), lit(SplitM)) * SplitA + SplitC, lit(SplitM))
    docs.join(broadcast(rates), "lang")
      .filter(h < col("thresh"))
      .drop("thresh")
  }
}

/** LCG constants shared by the split and mix operators (Knuth/glibc;
  * public-domain folklore), factored so both cite one definition.
  */
private[text] object CorpusShardLcg {
  val SplitA = 1103515245L
  val SplitC = 12345L
  val SplitM = 2147483648L
}
