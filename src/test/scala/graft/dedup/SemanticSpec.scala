package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup-family contracts (Semantic): k-means clustering with
  * planted co-assignment, within-cluster semantic dedup recall, and
  * the quality-classifier filter. Teeth: a detuned knob must flip a
  * pinned boolean, or the pin guards nothing.
  */
class SemanticSpec extends SparkSpec {

  test("corpus_cluster: exact copies co-assign structurally, c99 with margin, Lloyd improves") {
    val rows = Semantic.clusterRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("c99", "exact", "fit"))
    rows.foreach(r => assert(r.getBoolean(1) && r.getBoolean(2),
      s"tier ${r.getString(0)} failed its contract: $r"))
  }

  test("dedup_semantic: all cosine tiers clear their pins at sf0.001") {
    val rows = Semantic.semanticDedupRecall(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("c95", "c97", "c99"))
    rows.foreach(r => assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
      s"tier ${r.getString(0)} failed its contract: $r"))
  }

  test("dedup_semantic teeth: raising tau above the tiers kills their recall") {
    // tau = 0.995 sits above every planted tier (0.99/0.97/0.95): no
    // planted pair can clear the threshold, recall_ok must go false —
    // proving the pinned booleans actually measure the threshold path.
    val rows = Semantic.semanticDedupRecall(spark, sf0001, tau = 0.995).collect()
    assert(rows.forall(!_.getBoolean(2)),
      s"tau=0.995 should zero out tier recall: ${rows.mkString(", ")}")
  }

  test("semantic candidates: cluster-size guard fails loudly, not quadratically") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    try {
      // targetSize=8 with maxClusterFactor=1 caps clusters at 8 members;
      // 500 vectors over ~63 clusters must overflow somewhere.
      val ex = intercept[IllegalArgumentException] {
        Semantic.semanticCandidatesOf(e, targetSize = 8, maxClusterFactor = 1).count()
      }
      assert(ex.getMessage.contains("quadratic"),
        s"guard message should explain the blowup: ${ex.getMessage}")
    } finally { e.unpersist(); () }
  }

  test("semantic candidates are symmetric-free and exact-cosine-verified") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    try {
      val cands = Semantic.semanticCandidatesOf(e).persist()
      try {
        assert(cands.filter(col("id_a") >= col("id_b")).count() == 0)
        assert(cands.filter(col("cosine") > 1.0001 || col("cosine") < -1.0001).count() == 0)
        // within-cluster generation: every pair's two sides share the
        // cluster of the SAME deterministic assignment, so re-deriving
        // candidates yields the identical pair set
        val again = Semantic.semanticCandidatesOf(e)
        assert(cands.select("id_a", "id_b").except(again.select("id_a", "id_b")).count() == 0)
      } finally { cands.unpersist(); () }
    } finally { e.unpersist(); () }
  }
}
