package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wiring contract for the driver entry point: every oracle has a
  * query, names stay unique, and the flagship entry produces rows.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("the surface is substantial and mostly oracle-checked") {
    val n = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    assert(n >= 60, s"query surface shrank to $n")
    assert(o.toDouble / n >= 0.9, s"oracle coverage fell to $o/$n")
  }

  test("no oracle SQL references a table outside the test schema") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // the trailing lookahead skips EXTRACT(YEAR FROM o.o_orderdate):
    // a qualified COLUMN after FROM is not a table reference
    val fromRe = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)(?![a-z0-9_.])".r
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      val sql = rawSql.replaceAll("--[^\n]*", "") // prose in comments is not a reference
        .replaceAll("(?i)IS\\s+NOT\\s+DISTINCT\\s+FROM", "<=>") // the FROM in the null-safe operator is not a table ref
      // CTE with optional column list: `name AS (` or `name(c1, c2) AS (`
      val cteNames = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- cteNames
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
