package graft.tools

import org.apache.spark.sql.functions._
import graft.dedup.{Cluster, Dedup, NearDup}

/** Phase timing of the `dedup_near_survivors` pipeline at bench
  * conditions — which of eligibility / chain-corpus / minhash-LSH
  * pairs / connected components / final manifest owns the ~6 s
  * (round-14 optimization, guide §1).
  */
object ClusterPhases {
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
      println(f"CLUSTPHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (round <- 1 to 2) {
      println(s"CLUSTPHASE ---- round $round")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      t("guardIds") { NearDup.guardIds(d, "doc_id") }
      val elig = t("elig-checkpoint") {
        val e = NearDup.eligibleDocs(spark, sfDir, 2, 60).localCheckpoint()
        e.count(); e
      }
      val corpus = t("chain-corpus-checkpoint") {
        val c = Cluster.chainDocs(d, elig).localCheckpoint()
        c.count(); c
      }
      val pairs = t("minhash-pairs-checkpoint") {
        val p = Dedup.minhashCandidatesOf(corpus)
          .filter(col("jaccard") >= 0.85)
          .select("id_a", "id_b").localCheckpoint()
        println(s"CLUSTPHASE n_pairs=${p.count()}")
        p
      }
      val comps = t("connected-components") { Cluster.connectedComponents(pairs) }
      t("final-manifest") {
        corpus.select("doc_id")
          .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("cluster_id"))
          .withColumn("keep", col("doc_id") === col("cluster_id"))
          .orderBy("doc_id").collect()
      }
    }
    spark.stop()
  }
}
