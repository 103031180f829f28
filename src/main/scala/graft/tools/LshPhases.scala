package graft.tools

import org.apache.spark.sql.functions._
import graft.dedup.{Cluster, Dedup, NearDup}

/** Sub-phase timing of [[Dedup.minhashCandidatesOf]] over the
  * dedup_near_survivors chain corpus at bench conditions (round-15,
  * guide §1): which of shingle-checkpoint / signature aggregation /
  * band checkpoint / bucket self-join / Jaccard verify owns the ~3 s
  * the pipeline still costs after the shingle-once change.
  */
object LshPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"LSHPHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (rnd <- 1 to 2) {
      println(s"LSHPHASE ---- round $rnd")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val elig = NearDup.eligibleDocs(spark, sfDir, 2, 60).localCheckpoint()
      val corpus = t("chain-corpus") {
        val c = Cluster.chainDocs(d, elig).localCheckpoint(); c.count(); c
      }
      val grams = t("grams-checkpoint") {
        Dedup.shingleSets(corpus, 3).localCheckpoint()
      }
      val sigs = t("signature-agg") {
        val s = Dedup.minhashSignaturesFromShingleSets(grams, 64).localCheckpoint()
        s.count(); s
      }
      val banded = t("band-checkpoint") {
        Dedup.capBuckets(Dedup.bandBuckets(sigs, 16, 4),
          Seq("band", "bucket"), 10000).localCheckpoint()
      }
      val cand = t("bucket-self-join") {
        val c = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
          .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
            Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
          .distinct().localCheckpoint()
        println(s"LSHPHASE n_cand=${c.count()}")
        c
      }
      t("jaccard-verify") {
        val n = cand
          .join(grams.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(grams.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("jaccard", round(
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b"))), 4))
          .filter(col("jaccard") >= 0.85).count()
        println(s"LSHPHASE n_pairs=$n")
      }
    }
    spark.stop()
  }
}
