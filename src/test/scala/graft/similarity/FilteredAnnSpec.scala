package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Attribute-filtered ANN pins (round-13 verdict #5): the predicate
  * runs BELOW the rank window (in the list scan, not post-filtering),
  * and the planted contract — every probe's exact-dup decoy fails the
  * filter, so only an in-scan filter can return the pinned answer.
  */
class FilteredAnnSpec extends SparkSpec {

  test("the metadata predicate sits BELOW the rank window in the plan — " +
    "in-list-scan filtering (pushed to the parquet scan), never " +
    "post-filtering the top-k") {
    // store the tag as a REAL parquet column: on the in-memory corpus
    // the literal tags constant-fold and the whole failing union branch
    // is pruned at plan time (even stronger, but nothing left to pin);
    // the stored column is the production shape — metadata beside the
    // vectors — and makes the pushdown observable.
    val dir = java.nio.file.Files.createTempDirectory("graft-filtann-").toString
    FilteredAnn.taggedCorpus(spark, sf001, probeEvery = 50, passCos = 0.97)
      .write.mode("overwrite").parquet(dir)
    val data = spark.read.parquet(dir)
    val probes = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val cent = Ivf.trainCentroids(data.select("vec_id", "embedding"), 16)
    val index = Ivf.assign(data, cent)
    val df = FilteredAnn.queryIndexFiltered(cent, index, data, probes,
      k = 1, nProbe = 4, col("allowed"))

    // the predicate reaches the candidate-side parquet scan
    val planStr = df.queryExecution.executedPlan.toString
    val pushed = planStr.split("\n").filter(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("allowed")),
      s"the allowed-predicate must be pushed into a parquet scan:\n$planStr")

    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window}
    def referencesAllowed(f: Filter): Boolean =
      f.condition.references.exists(_.name == "allowed")
    val windows = plan.collect { case w: Window => w }
    // the rank window over (cosine desc, vec_id) is the top-k — NOT
    // the probe-list row_number over centroid distances, whose subtree
    // legitimately has no candidate filter
    val rankWindows = windows.filter(w =>
      w.windowExpressions.exists(_.toString.contains("row_number")) &&
        w.orderSpec.exists(_.toString.contains("cosine")))
    assert(rankWindows.nonEmpty, s"no rank window found:\n$plan")
    rankWindows.foreach { w =>
      assert(w.child.collect { case f: Filter if referencesAllowed(f) => f }.nonEmpty,
        s"the allowed-filter must be INSIDE the rank window's subtree:\n$plan")
    }
    // and no allowed-filter is reachable from the root WITHOUT passing
    // through a window — that position would be post-filtering
    def postFilters(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[Filter] = p match {
      case _: Window => Nil
      case f: Filter if referencesAllowed(f) => Seq(f)
      case other => other.children.flatMap(postFilters)
    }
    assert(postFilters(plan).isEmpty,
      s"allowed-filter found ABOVE the rank window (post-filtering):\n$plan")
  }

  test("planted contract: filtered top-1 is the PASSING rotated copy for " +
    "every probe; the unfiltered top-1 is the failing exact duplicate") {
    val rows = FilteredAnn.filteredTop1(spark, sf001).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "ivf_filtered")
    assert(r.getBoolean(1), "probes must hit their passing plant at cosine < 1 " +
      "at >= 0.90 rate (1.00 at this SF)")
    assert(r.getBoolean(2), "the decoy must be the unfiltered top-1 — otherwise " +
      "the filter was never load-bearing")
  }

  test("k-row contract: the filtered query still returns one row per probe " +
    "(post-filtering the unfiltered top-1 would return zero)") {
    val data = FilteredAnn.taggedCorpus(spark, sf001, probeEvery = 50, passCos = 0.97)
    val probes = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val cent = Ivf.trainCentroids(data.select("vec_id", "embedding"), 16)
    val index = Ivf.assign(data, cent)
    val got = FilteredAnn.queryIndexFiltered(cent, index, data, probes,
      k = 1, nProbe = 4, col("allowed"))
    assert(got.count() == probes.count(),
      "every probe must get k=1 rows from the passing candidates")
  }
}
