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
    // keywords that can directly follow a table ref (so they are never
    // mistaken for an alias) or terminate a comma-separated FROM list
    val stopWords = Set("where", "group", "order", "on", "join", "left",
      "right", "inner", "full", "cross", "union", "having", "limit",
      "as", "and", "or", "select", "when", "then", "else", "end",
      "qualify", "using", "values", "lateral", "unnest")
    def tableRefs(rawSql: String): (Set[String], Set[String]) = {
      val sql = rawSql.replaceAll("--[^\n]*", "") // prose in comments is not a reference
        .replaceAll("(?i)IS\\s+NOT\\s+DISTINCT\\s+FROM", "<=>") // the FROM in the null-safe operator is not a table ref
        // EXTRACT(unit FROM expr): that FROM introduces a column, not a table
        .replaceAll("(?i)EXTRACT\\s*\\(\\s*[A-Z]+\\s+FROM[^)]*\\)", " extracted ")
      // CTE with optional column list: `name AS (` or `name(c1, c2) AS (`
      val cteNames = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // token scan: after FROM/JOIN, audit EVERY ref in the (possibly
      // comma-separated, possibly aliased) table list — a dotted name
      // (otherdb.secret_table) is a violation, never an exemption
      val toks = "[a-z_][a-z0-9_.]*|,|\\(|\\)".r
        .findAllIn(sql.toLowerCase).toVector
      val refs = scala.collection.mutable.Set.empty[String]
      var i = 0
      while (i < toks.length) {
        if ((toks(i) == "from" || toks(i) == "join") &&
          i + 1 < toks.length && toks(i + 1) != "(") {
          var expectRef = true
          var j = i + 1
          var done = false
          while (j < toks.length && !done) {
            val t = toks(j)
            if (expectRef) {
              if (t == "," || t == "(" || t == ")" || stopWords(t)) done = true
              else {
                // `name(` is a TABLE FUNCTION (generate_series, ...),
                // not a table reference
                if (!(j + 1 < toks.length && toks(j + 1) == "(")) refs += t
                expectRef = false
                j += 1
              }
            } else t match {
              case "," => expectRef = true; j += 1 // next table in the list
              case w if !stopWords(w) && w != "(" && w != ")" => j += 1 // alias
              case _ => done = true
            }
          }
          i = j
        } else i += 1
      }
      (refs.toSet, cteNames)
    }
    // the audit must CATCH violations, not just pass healthy text:
    // a namespaced table, and a rogue second table in a comma list
    assert(tableRefs("SELECT 1 FROM otherdb.secret_table")._1
      .contains("otherdb.secret_table"), "dotted table refs must be audited")
    assert(tableRefs("SELECT 1 FROM lineitem l, rogue r WHERE 1=1")._1 ==
      Set("lineitem", "rogue"), "every table in a comma list must be audited")
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      val (refs, cteNames) = tableRefs(rawSql)
      val unknown = refs -- tables -- cteNames
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
