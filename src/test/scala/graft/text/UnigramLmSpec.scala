package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {

  private def plant = {
    import spark.implicits._
    // word stream: xy ×9, xyz ×1, z ×14 — crafted so the alternation
    // MOVES: round 2 re-segments "xyz" and prunes a round-1 survivor
    Seq(("xy", 9L), ("xyz", 1L), ("z", 14L)).toDF("w", "cnt")
  }

  test("planted hand-derived EM trajectory: seed scores, round-1 prune, " +
    "round-2 segmentation flip, round-2 prune of a round-1 survivor") {
    val states = UnigramLm.trainRounds(plant, k = 2)
    def asMap(v: UnigramLm.Vocab) = v.map(e => e._1 -> ((e._2, e._3))).toMap

    // seed: freqs x10 y10 z15 xy10 yz1 xyz1, T=47 (bitlen 6) →
    // qlp −3 for the bitlen-4 pieces, −6 for the singletons
    val v0 = asMap(states(0))
    assert(v0 == Map(
      "x" -> ((10L, -3L)), "y" -> ((10L, -3L)), "z" -> ((15L, -3L)),
      "xy" -> ((10L, -3L)), "yz" -> ((1L, -6L)), "xyz" -> ((1L, -6L))),
      s"seed state wrong: $v0")

    // round 1: best paths are ["xy"], ["xyz"] (fewer-pieces tie-break
    // over xy+z at equal score −6), ["z"] → usage xy9 xyz1 z14; yz
    // PRUNED (zero usage), x/y floored to 1; T=26 (bitlen 5)
    val v1 = asMap(states(1))
    assert(v1 == Map(
      "x" -> ((1L, -5L)), "y" -> ((1L, -5L)), "z" -> ((14L, -2L)),
      "xy" -> ((9L, -2L)), "xyz" -> ((1L, -5L))),
      s"round-1 state wrong: $v1")
    assert(!v1.contains("yz"), "yz must be pruned after round 1")

    // the FLIP: under round-1 scores, xy(−2)+z(−2) = −4 now beats
    // xyz(−5) — the re-estimation changed the best path
    def segOf(scores: Map[String, Long], w: String): Seq[String] =
      UnigramLm.segmented(plant, scores).filter(col("w") === w)
        .select("pieces").head().getSeq[String](0)
    val s0 = states(0).map(e => e._1 -> e._3).toMap
    val s1 = states(1).map(e => e._1 -> e._3).toMap
    assert(segOf(s0, "xyz") == Seq("xyz"), "round-1 E-step keeps xyz whole")
    assert(segOf(s1, "xyz") == Seq("xy", "z"), "round-2 E-step must flip to xy+z")

    // round 2: usage xy10 z15, xyz now ZERO → pruned despite having
    // survived round 1; T=27 (bitlen 5)
    val v2 = asMap(states(2))
    assert(v2 == Map(
      "x" -> ((1L, -5L)), "y" -> ((1L, -5L)),
      "xy" -> ((10L, -2L)), "z" -> ((15L, -2L))),
      s"round-2 state wrong: $v2")
  }

  test("segmentation is a total exact cover: pieces concat to the word, " +
    "no null paths (single-char coverage), deterministic") {
    val words = UnigramLm.wordTable(spark, sf0001).localCheckpoint()
    val vocab = UnigramLm.trainRounds(words).last
    val seg = UnigramLm.segmented(words, vocab.map(v => v._1 -> v._3).toMap)
      .select(col("w"), col("pieces"),
        concat_ws("", col("pieces")).as("joined"))
    assert(seg.filter(col("pieces").isNull ||
      exists(col("pieces"), _.isNull)).count() == 0,
      "every word must have a complete best path — singles guarantee coverage")
    assert(seg.filter(col("joined") =!= col("w")).count() == 0,
      "pieces must reassemble the word exactly")
    val again = UnigramLm.trainRounds(words).last
    assert(vocab == again, "training must be deterministic")
  }

  test("words longer than M are excluded from training — the documented " +
    "pathological-string cap, enforced at the word table") {
    import spark.implicits._
    // wordTable is the single gate: a >16-char token must never reach
    // the seed (its chars would otherwise enter the alphabet)
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram-cap-")
    try {
      Seq((1L, "ab " + ("q" * 20))).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val words = UnigramLm.wordTable(spark, dir.toString)
        .collect().map(_.getString(0)).toSet
      assert(words == Set("ab"), s"the 20-char word must be filtered: $words")
      val vocab = UnigramLm.trainRounds(UnigramLm.wordTable(spark, dir.toString)).last
      assert(!vocab.exists(_._1.contains("q")),
        "no piece of the excluded word may enter the vocabulary")
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val l = java.nio.file.Files.list(p); try l.forEach(rm) finally l.close()
        }
        java.nio.file.Files.deleteIfExists(p); ()
      }
      rm(dir)
    }
  }

  test("corpus train: singles always survive, multis only with usage, " +
    "vocab bounded by alphabet + V") {
    val out = UnigramLm.textUnigramTrain(spark, sf0001).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) >= 1L), "freqs ≥ 1 (floors)")
    val pieces = out.map(_.getString(0))
    val singles = pieces.filter(_.length == 1).toSet
    val chars = UnigramLm.wordTable(spark, sf0001)
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(singles == chars, "exactly the corpus alphabet survives as singles")
    assert(pieces.length <= chars.size + UnigramLm.V,
      "vocab ≤ alphabet + multi-char budget")
    // ordering contract of the result frame
    val sorted = out.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(sorted == sorted.sorted, "ordered by (freq DESC, piece)")
  }

  test("encode: n_pieces ≥ n_words per doc, and compression is real " +
    "(some word maps to a multi-char piece)") {
    val enc = UnigramLm.textUnigramEncode(spark, sf0001).collect()
    assert(enc.nonEmpty)
    assert(enc.forall(r => r.getLong(2) >= r.getLong(1)),
      "every word is at least one piece")
    val chars = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(sum(length(regexp_replace(lower(col("text")), "[^a-z]", ""))))
      .head().getLong(0)
    assert(enc.map(_.getLong(2)).sum < chars,
      "piece count strictly below character count — multis fire")
  }
}
