package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source BFS shortest-hop distances (SURVEY.md §2b) — the
  * SSSP primitive (distance-to-seed-set: "how far is every page from
  * a known-spam seed", "blast radius of a failed host"). Distinct
  * from the closure operators: `q_hierarchy`/`q_recursive_cte` walk a
  * FOREST where every node has one path; this walks a CYCLIC graph
  * where the answer is the MINIMUM over many paths, which is exactly
  * what frontier BFS settles.
  *
  * Graph: the planted grid over the dense order-key space (the
  * q_hierarchy discipline — topology derived from keys so any engine
  * reproduces it): row k div W, column k mod W, undirected edges to
  * the +1 neighbor (same row) and the +W neighbor; sources every
  * 5000th key; 8 BFS rounds. On a solid grid the true distance from a
  * corner source is the Manhattan distance — the spec pins that
  * closed form; the oracle runs an independent capped `WITH
  * RECURSIVE` fixpoint over the same edges in DuckDB.
  *
  * Scale shape — textbook distributed frontier BFS: per round ONE
  * join of the (8-byte) frontier against the edge table partitioned
  * on src, one `distinct`, one LEFT ANTI against the settled set (so
  * work is ∝ frontier, never ∝ settled corpus), `localCheckpoint`
  * per round to cut lineage (the q_pagerank iteration discipline).
  * State is (key, dist) pairs only. Round count is the fixed search
  * radius K — the operator contract is "everything within K hops",
  * the bounded form a 100 TB graph query needs (unbounded SSSP on a
  * high-diameter graph is a different algorithm: delta-stepping).
  */
object ShortestPath {

  private val W = 100L
  private val SourceEvery = 5000L
  private val Rounds = 8

  def qShortestPath(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k")).localCheckpoint()

    def neighbor(step: Long, sameRow: Boolean): DataFrame = {
      val j = nodes.as("a").join(nodes.as("b"),
        col("b.k") === col("a.k") + step &&
          (if (sameRow) call_function("div", col("a.k"), lit(W)) ===
            call_function("div", col("b.k"), lit(W)) else lit(true)))
      j.select(col("a.k").as("src"), col("b.k").as("dst"))
    }
    val fwd = neighbor(1L, sameRow = true).unionAll(neighbor(W, sameRow = false))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var settled = nodes.filter(col("k") % SourceEvery === 0)
      .select(col("k"), lit(0L).as("dist")).localCheckpoint()
    var frontier = settled.select("k")
    (1 to Rounds).foreach { r =>
      val next = edges.join(frontier.withColumnRenamed("k", "src"), Seq("src"))
        .select(col("dst").as("k")).distinct()
        .join(settled, Seq("k"), "left_anti")
        .select(col("k"), lit(r.toLong).as("dist")).localCheckpoint()
      settled = settled.unionAll(next).localCheckpoint()
      frontier = next.select("k")
    }
    settled.select(col("k").as("o_orderkey"), col("dist")).orderBy("o_orderkey")
  }

  /** DuckDB oracle: capped recursive fixpoint over the same planted
    * grid; UNION (dedup) bounds the state, min(d) is the distance.
    */
  val oracleSql: String =
    s"""WITH RECURSIVE n AS (SELECT o_orderkey AS k FROM orders),
       |e0 AS (
       |  SELECT a.k AS src, b.k AS dst FROM n a JOIN n b
       |    ON b.k = a.k + 1 AND a.k // $W = b.k // $W
       |  UNION ALL
       |  SELECT a.k, b.k FROM n a JOIN n b ON b.k = a.k + $W
       |), e AS (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
       |), walk AS (
       |  SELECT k AS node, 0 AS d FROM n WHERE k % $SourceEvery = 0
       |  UNION
       |  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
       |  WHERE w.d < $Rounds
       |)
       |SELECT node AS o_orderkey, CAST(min(d) AS BIGINT) AS dist
       |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin
}
