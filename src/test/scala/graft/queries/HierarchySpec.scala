package graft.queries

import graft.SparkSpec

class HierarchySpec extends SparkSpec {

  test("pointer-jumped closure equals the naive chase, and depth covers multiple doubling rounds") {
    val got = Hierarchy.qHierarchy(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def chase(n: Long): (Long, Long) = {
      var (cur, d) = (n, 0L)
      while (cur >= 10) { cur /= 10; d += 1 }
      (cur, d)
    }
    got.keys.foreach { n =>
      assert(got(n) == chase(n), s"node $n: got ${got(n)} expected ${chase(n)}") }
    // sf0.01 keys reach 14999 → depth 4: the loop must have taken more
    // than one jump round (2^1 < 4), i.e. the doubling actually chained
    assert(got.values.map(_._2).max >= 4, "corpus must exercise multi-round doubling")
    assert(got.size == 15000)
  }

  test("convergence detection shares the round's checkpoint action") {
    // The observe()-based undone-count must not add an action per round:
    // the iterative phase is EXACTLY one "checkpoint" action per round
    // (plus init) and ZERO "count" actions — the old shape ran
    // checkpoint + count every round.
    val actions = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = { actions.add(funcName); () }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def settled(): List[String] = {
      // listener delivery is async: poll until the action list is stable
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(100); waited += 100
        val now = actions.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      import scala.jdk.CollectionConverters._
      actions.asScala.toList
    }
    try {
      val df = Hierarchy.qHierarchy(spark, sf001) // rounds run eagerly here
      val seen = settled()
      val maxDepth = df.agg(org.apache.spark.sql.functions.max("depth")).head().getLong(0)
      assert(maxDepth >= 4, s"corpus too shallow to pin action counts: depth $maxDepth")
      val rounds = math.ceil(math.log(maxDepth.toDouble) / math.log(2.0)).toInt
      val counts = seen.groupBy(identity).view.mapValues(_.size).toMap
      assert(!counts.contains("count"),
        s"convergence must ride on the checkpoint action, saw actions: $counts")
      assert(counts.getOrElse("localCheckpoint", 0) + counts.getOrElse("checkpoint", 0)
        <= rounds + 2,
        s"expected <= 1 init + ${rounds + 1} round checkpoints, saw: $counts")
    } finally spark.listenerManager.unregister(listener)
  }
}
