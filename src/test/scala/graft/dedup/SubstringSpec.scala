package graft.dedup

import graft.SparkSpec

/** Planted-structure contract for exact-substring dedup: a shared run
  * of EXACTLY W tokens flags both docs, a run of W-1 flags neither,
  * and sub-window docs get zero windows. The window boundary is the
  * semantics — an off-by-one in the slice arithmetic flips the W-1
  * control.
  */
class SubstringSpec extends SparkSpec {

  private def doc(id: Long, toks: Seq[String]) = (id, toks.mkString(" "))

  test("docs sharing an exact W-token run are flagged; a W-1 run is not") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"a$i")
    val planted = Seq(
      doc(1L, a), // a1..a20
      doc(2L, (1 to 8).map(i => s"b$i") ++ a.slice(4, 16)), // shares a5..a16 (12 tokens)
      doc(3L, (1 to 20).map(i => s"c$i")), // fully distinct
      doc(4L, (1 to 5).map(i => s"d$i")), // shorter than W
      doc(5L, (1 to 5).map(i => s"e$i") ++ a.slice(5, 16) ++ Seq("zzz")) // 11-token run only
    ).toDF("doc_id", "text")
    val audit = Substring.auditOf(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    assert(audit(1L) == ((9L, 1L, true)), s"doc1: ${audit(1L)}") // 20-11 windows, one shared
    assert(audit(2L) == ((9L, 1L, true)), s"doc2: ${audit(2L)}")
    assert(audit(3L) == ((9L, 0L, false)), s"doc3: ${audit(3L)}")
    assert(audit(4L) == ((0L, 0L, false)), s"doc4: ${audit(4L)}")
    assert(audit(5L) == ((6L, 0L, false)),
      s"doc5 shares only an 11-token run and must NOT be flagged: ${audit(5L)}")
  }

  test("a window repeated inside one doc does not self-flag") {
    import spark.implicits._
    val w = (1 to 12).map(i => s"w$i")
    // the same 12-gram occurs twice inside doc 10 and nowhere else
    val planted = Seq(
      doc(10L, w ++ Seq("x") ++ w),
      doc(11L, (1 to 15).map(i => s"y$i"))
    ).toDF("doc_id", "text")
    val audit = Substring.auditOf(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(audit(10L) == ((0L, false)),
      s"intra-doc repetition is not cross-doc sharing: ${audit(10L)}")
  }

  test("span structure: two disjoint 14-token shared runs yield 2 spans of 14") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"a$i")
    val planted = Seq(
      doc(1L, a),
      // shares a1..a14 and a17..a30 with doc 1 — two 14-token runs
      // (3 consecutive windows each), separated by unshared material
      doc(2L, (1 to 5).map(i => s"b$i") ++ a.slice(0, 14) ++
        (1 to 5).map(i => s"c$i") ++ a.slice(16, 30)),
      doc(3L, (1 to 20).map(i => s"z$i"))
    ).toDF("doc_id", "text")
    val spans = Substring.spansOf(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(spans.keySet == Set(1L, 2L), s"only the sharing docs appear: $spans")
    assert(spans(1L) == ((2L, 14L)), s"doc1 spans: ${spans(1L)}")
    assert(spans(2L) == ((2L, 14L)), s"doc2 spans: ${spans(2L)}")
  }

  test("corpus audit reconciles: flagged == docs with n_dup_windows > 0") {
    val rows = Substring.substringAudit(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(3) == (r.getLong(2) > 0)))
    assert(rows.exists(_.getBoolean(3)),
      "the synthetic corpus contains exact duplicates — some doc must share a window")
  }
}
