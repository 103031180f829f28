package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def enc(w: String): String = w.map(c => s"_${c}_").mkString

  test("planted corpus: the merge sequence is the hand-derived one") {
    // words: abab×10, abc×5, ab×3. Pair counts round 1:
    //   (a,b): 2·10 + 5 + 3 = 28, (b,a): 10, (b,c): 5  → merge (a,b,28)
    // round 2 over [ab,ab]×10 [ab,c]×5 [ab]×3:
    //   (ab,ab): 10, (ab,c): 5                         → merge (ab,ab,10)
    // round 3 over [abab]×10 [ab,c]×5 [ab]×3:
    //   (ab,c): 5                                      → merge (ab,c,5)
    // round 4: every word is one symbol → exhausted, 3 rows for k=10
    val words = Seq((enc("abab"), 10L), (enc("abc"), 5L), (enc("ab"), 3L))
      .toDF("enc", "cnt")
    val got = BpeTrain.train(words, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 28L), (2, "ab", "ab", 10L), (3, "ab", "c", 5L)))
  }

  test("run merging is left-to-right non-overlapping (the BPE rule)") {
    // aaaa with merge (a,a): [aa,aa] (never [a,aa,a] or overlap); the
    // second round then merges (aa,aa)
    val words = Seq((enc("aaaa"), 1L)).toDF("enc", "cnt")
    val got = BpeTrain.train(words, 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
    // (a,a) count in aaaa is 3 ADJACENT OCCURRENCES (positions 1,2,3)
    // but application still produces [aa,aa] — count and application
    // are different quantities, both pinned here
  }

  test("argmax ties break lexicographically — deterministic cross-engine") {
    // (x,y) and (y,x) both count 2; (x,y) < (y,x) must win
    val words = Seq((enc("xy"), 2L), (enc("yx"), 2L)).toDF("enc", "cnt")
    val got = BpeTrain.train(words, 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("x", "y", 2L)))
  }

  test("boundary safety: a pair never fires inside a longer symbol") {
    // after merging (a,b) → ab, the word [ab, c] contains the SYMBOL
    // pair (ab, c) but NOT (b, c) — a naive substring rewrite would
    // corrupt it
    val words = Seq((enc("abc"), 1L)).toDF("enc", "cnt")
    val got = BpeTrain.train(words, 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("a", "b"), ("ab", "c")),
      s"expected [(a,b), (ab,c)], got $got — (b,c) firing means the boundary leaked")
  }

  test("applyMerges equals the training loop's own final vocabulary (encode = replay)") {
    val words = Seq(("abab", enc("abab"), 10L), ("abc", enc("abc"), 5L), ("ab", enc("ab"), 3L))
      .toDF("w", "enc", "cnt")
    val merges = BpeTrain.trainMerges(words.select("enc", "cnt"), 10)
    val got = BpeTrain.applyMerges(words, merges)
      .select("w", "enc").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // after (a,b), (ab,ab), (ab,c): abab→[abab], abc→[abc], ab→[ab]
    assert(got == Map("abab" -> "_abab_", "abc" -> "_abc_", "ab" -> "_ab_"))
  }

  test("text_bpe_encode: per-doc counts bounded by words below and chars above, and merges bite") {
    val rows = BpeTrain.textBpeEncode(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nw, nb) =>
      assert(nb >= nw, s"doc $doc: a word is at least one token")
    }
    // corpus-wide the 10 merges must compress: strictly fewer BPE
    // tokens than characters (every merge round had a positive count)
    val chars = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .agg(sum(length(col("w")))).head().getLong(0)
    val bpe = rows.map(_._3).sum
    assert(bpe < chars, s"10 merges must compress ($bpe tokens vs $chars chars)")
  }

  test("sf0.001 corpus: 10 merges, counts monotone within rank ties impossible, all from [a-z]") {
    val got = BpeTrain.textBpeTrain(spark, sf0001).collect()
    assert(got.length == 10)
    assert(got.map(_.getInt(0)).toSeq == (1 to 10))
    got.foreach { r =>
      assert((r.getString(1) + r.getString(2)).forall(c => c >= 'a' && c <= 'z'))
      assert(r.getLong(3) > 0)
    }
    // each merge's count is ≤ every EARLIER merge's count is NOT
    // guaranteed by BPE (a merge can create a new frequent pair), but
    // rank-1 must be the global argmax: no later count may exceed it
    assert(got.map(_.getLong(3)).max == got.head.getLong(3))
  }
}
