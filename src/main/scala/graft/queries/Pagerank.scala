package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over the supplier co-occurrence graph (SURVEY.md §2b):
  * the canonical iterative link-analysis operator (Page et al. 1999),
  * 5 fixed rounds of r' = 0.15·T + 0.85·Σ_in r/deg in EXACT INTEGER
  * arithmetic — ranks are BIGINTs at scale T = 10^12 and the damping
  * products are `(3·T) div 20` and `(17·x) div 20`, so two engines
  * agree bit-for-bit with no float accumulation-order drift (the
  * q_transition/hierarchy discipline applied to an iterative fixpoint;
  * T suits corpora to ~10^6 vertices — larger graphs drop T).
  *
  * Scale shape: each round is ONE shuffle — contributions flow along
  * edges (join on the 8-byte src key), sum map-side-combined per dst —
  * and per-round `localCheckpoint` cuts lineage so the plan stays flat
  * across rounds (the Cluster/Hierarchy iteration discipline). The
  * rank table is (id, long); document payloads never enter. Isolated
  * vertices hold the bare teleport mass. Output is the top-10 cut
  * (rank desc, id) — a WindowGroupLimit-free global limit over the
  * vertex-cardinality table.
  */
object Pagerank {

  private val T = 1000000000000L
  private val Rounds = 5

  def qPagerank(spark: SparkSession, sfDir: String): DataFrame =
    rankOf(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("s")),
      spark)

  private[queries] def rankOf(li: DataFrame, spark: SparkSession): DataFrame = {
    val und = Triangle.cooccurrenceEdges(li)
    // directed both ways; undirected degree = out-degree
    val edges = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    // checkpointed ONCE: deg is round-invariant, and an uncheckpointed
    // reference re-ran the edges groupBy (a full shuffle) inside every
    // round's join (round-14; guide §2.4 — remove repeated shuffles)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d")).localCheckpoint()
    val verts = li.select(col("s")).distinct().localCheckpoint()

    var ranks = verts.select(col("s"), lit(T).as("r")).localCheckpoint()
    (1 to Rounds).foreach { _ =>
      // per-VERTEX contribution r div d first (a vertex-sized join),
      // THEN flow along edges — the same exact integer per edge, but the
      // edge-cardinality join carries one 8-byte value instead of (r, d)
      // and the div evaluates |V| times, not |E| (guide §2.3)
      val contrib = ranks.withColumnRenamed("s", "src")
        .join(deg, Seq("src"))
        .select(col("src"), expr("r div d").as("c"))
      val inflow = edges
        .join(contrib, Seq("src"))
        .groupBy(col("dst").as("s"))
        .agg(sum(col("c")).as("inflow"))
      // int64 headroom: the damping multiply bounds total rank mass at
      // 2^63/17 ≈ 5.4e17 — a strong hub can reach that on a ~5×10^5-
      // vertex graph at T=10^12 (tighter than the naive ~10^6-vertex
      // bound). ANSI mode (the engine default, pinned at every entry
      // point) makes the multiply FAIL LOUDLY past it, never wrap; for
      // larger graphs lower T one decade per 10× vertices.
      ranks = verts
        .join(inflow, Seq("s"), "left")
        .select(col("s"),
          (lit((3L * T) / 20L) +
            expr(s"17 * coalesce(inflow, 0L) div 20")).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("s").as("s_suppkey"), col("r").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("s_suppkey"))
      .limit(10)
  }
}
