package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive hierarchy closure (SURVEY.md §2b): the `WITH RECURSIVE`
  * operator class Spark has no native operator for — each node of an
  * id-derived forest (parent = node div 10, roots = nodes < 10 over
  * the dense orders key space) is resolved to its ROOT and DEPTH.
  *
  * A naive parent-at-a-time loop needs O(depth) joins; this uses
  * POINTER JUMPING (the `dedup/Cluster` discipline applied to rooted
  * trees with distance accumulation): each round every node's
  * ancestor pointer chases its ancestor's pointer and adds the two
  * path lengths, so the resolved distance doubles per round and the
  * loop converges in O(log depth) self-joins. Every round shuffles
  * (node, anc, depth, done) ids only, lineage is cut per round
  * (`localCheckpoint`), and the iteration cap fails loudly — at 100 TB
  * a depth-40 hierarchy costs 6 rounds, not 40.
  *
  * Convergence detection rides ON the round's materialization job via
  * `observe` ([[org.apache.spark.sql.Observation]]): the undone-count
  * is a metric of the same job that checkpoints the round, so each
  * round is ONE job, not join-then-count's two (job count spec-pinned).
  *
  * The oracle is DuckDB's actual recursive CTE over the same edge
  * relation, so the fixpoint semantics are checked against a real
  * `WITH RECURSIVE` implementation, not a re-derivation.
  */
object Hierarchy {

  def qHierarchy(spark: SparkSession, sfDir: String): DataFrame = {
    val nodes = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("node"))

    // one job per round: the undone-count is an observed metric of the
    // checkpoint job itself
    def checkpointCounting(df: DataFrame, name: String): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation(name)
      val out = df
        .observe(obs, coalesce(sum(when(col("done"), 0L).otherwise(1L)), lit(0L)).as("remaining"))
        .localCheckpoint()
      (out, obs.get("remaining").asInstanceOf[Long])
    }

    // invariant: depth = distance(node → anc); done ⇔ anc is the root
    var (cur, remaining) = checkpointCounting(nodes.select(
      col("node"),
      when(col("node") < 10, col("node")).otherwise(expr("node div 10")).as("anc"),
      when(col("node") < 10, 0L).otherwise(1L).as("depth"),
      (col("node") < 10).as("done")), "hier_init")
    var rounds = 0
    while (remaining > 0) {
      rounds += 1
      require(rounds <= 40,
        s"hierarchy closure failed to converge after $rounds doubling rounds " +
          s"($remaining nodes unresolved) — cycle or missing parent in the edge relation")
      val anc = cur.select(col("node").as("anc"), col("anc").as("anc2"),
        col("depth").as("d2"), col("done").as("done2"))
      val next = checkpointCounting(cur.join(anc, "anc").select(
        col("node"),
        when(col("done"), col("anc")).otherwise(col("anc2")).as("anc"),
        when(col("done"), col("depth")).otherwise(col("depth") + col("d2")).as("depth"),
        (col("done") || col("done2")).as("done")), s"hier_round_$rounds")
      cur = next._1
      remaining = next._2
    }
    cur.select(col("node"), col("anc").as("root"), col("depth")).orderBy("node")
  }
}
