package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Benchmark decontamination — the overlap check an LLM training
  * pipeline runs so evaluation prompts don't leak into training data:
  * every document is scanned for token-aligned n-gram collisions with
  * a benchmark probe set, and any probe found outside its source is a
  * contamination hit (the published recipes use 8-13-gram collision;
  * 8 here because the synthetic docs are short).
  *
  * Scale shape: the corpus side explodes to DISTINCT-per-doc 8-grams
  * and joins the (small) probe set BROADCAST, so the 100 TB side
  * never shuffles — each scan task filters its grams against the
  * hashed probe map and only (probe, doc) hits survive to the final
  * tiny aggregation. With a benchmark set too large to broadcast the
  * same plan degrades gracefully to a hash-partitioned join on the
  * gram — the explode/dedup/join shape is unchanged.
  *
  * Correctness contract: probes are the first 8 tokens of every 37th
  * document; every 74th document additionally gets a CONTAMINATED
  * plant at `doc_id + 5·PlantOffset` embedding the probe phrase inside
  * filler. A probe always hits its own source (n_hit_docs ≥ 1); the
  * planted half must show n_hit_docs = 2 and `leaked = true`, so a
  * tokenization drift, a gram misalignment, or a lost join row flips
  * a boolean and breaks the hash.
  */
object Decontaminate {

  val ProbeEvery = 37
  val PlantEvery = 74 // every 2nd probe gets a contaminated plant
  val GramLen = 8

  /** Corpus + contaminated plants (probe phrase wrapped in filler). */
  def plantedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.dedup.NearDup.guardIds(d, "doc_id")
    val toks = Dedup.tokens(col("text"))
    d.select(col("doc_id"), lower(col("text")).as("text"))
      .unionByName(
        d.filter(col("doc_id") % PlantEvery === 0 && size(toks) >= GramLen)
          .select((col("doc_id") + 5 * Dedup.PlantOffset).as("doc_id"),
            concat(lit("decon filler opens here "),
              concat_ws(" ", slice(toks, 1, GramLen)),
              lit(" and filler closes")).as("text")))
  }

  /** Per-probe contamination audit over the planted corpus. */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = plantedCorpus(spark, sfDir)
    val toks = corpus.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= GramLen)
    // probes come from NATURAL docs only (plants sit above PlantOffset)
    val probes = toks
      .filter(col("doc_id") % ProbeEvery === 0 && col("doc_id") < Dedup.PlantOffset)
      .select(col("doc_id").as("bench_doc_id"),
        concat_ws(" ", slice(col("toks"), 1, GramLen)).as("gram"))
    // distinct 8-grams per doc (shinglesFromTokens dedups), so the join
    // hit count IS the distinct-document count per probe
    val docGrams = toks.select(col("doc_id"),
      explode(Dedup.shinglesFromTokens(col("toks"), GramLen)).as("gram"))
    docGrams.join(broadcast(probes), "gram")
      .groupBy("bench_doc_id")
      .agg(count(lit(1)).as("n_hit_docs"))
      .select(col("bench_doc_id"), col("n_hit_docs"),
        (col("n_hit_docs") > 1).as("leaked"))
      .orderBy("bench_doc_id")
  }
}
