package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-class) tokenizer TRAINING (SURVEY.md §2c)
  * — next to BPE ([[BpeTrain]]) the second public tokenizer family a
  * pretraining pipeline chooses between: fit a piece vocabulary by
  * alternating (E) best-path segmentation of the corpus under the
  * current piece scores with (M) re-estimation + pruning (Kudo 2018,
  * "Subword Regularization", §3.2's Viterbi decoding — hard-EM, the
  * deterministic member of the family).
  *
  * CROSS-ENGINE EXACTNESS is the design constraint everything else
  * follows from: real unigram-LM scores are float log-probs, and two
  * engines' `ln` differ in the last ulp — a hash-compared oracle dies
  * there. So scores are INTEGER-QUANTIZED log₂ likelihoods:
  * qlp(piece) = bitlen(freq) − bitlen(T) − 1, where bitlen(x) =
  * length of x's binary form (`bin()` in BOTH engines; equivalently
  * ⌊log₂x⌋+1) and T = Σ freq over the live vocabulary. qlp is within
  * 2 of log₂(freq/T) — the same quantized-floor trick as
  * `text_entropy` — and every DP comparison, tie rule, usage count,
  * prune decision, and re-score is exact integer arithmetic both
  * engines replay bit-for-bit.
  *
  * The alternation (constants P=4 max piece, M=16 max word, V=24
  * multi-char seed budget, K=2 rounds):
  *   seed  — all substrings (len 1..P) of the distinct-word table,
  *           freq = Σ wordcnt × occurrences; ALL single chars kept
  *           (coverage — SentencePiece never prunes base characters),
  *           multi-char top-V by (freq DESC, piece ASC);
  *   E     — Viterbi-segment every distinct word: DP over positions,
  *           b_j = max over i ∈ [j−P, j−1] of (b_i.score + qlp,
  *           fewer-pieces, longer-last-piece) — the struct-lexicographic
  *           tie chain makes the argmax total;
  *   M     — usage(piece) = Σ wordcnt × uses; multi-char pieces with
  *           usage 0 are PRUNED, single chars survive with freq floor 1,
  *           scores recomputed from the new (freq, T).
  *
  * Scale shape: training runs on the DISTINCT-WORD frequency table
  * (one corpus scan reduces 100 TB of text to |vocab_words| rows, the
  * [[BpeTrain]] discipline); each round is ONE distributed pass over
  * that table — the DP is one M-position `aggregate` fold of column
  * arithmetic (Catalyst higher-order function: interpreted but
  * driver-free, no UDF, no shuffle) with the piece scores riding
  * along as a map literal (vocab ∝ tokenizer size, bounded), plus
  * one |vocab|-row usage aggregate. The M-step itself is O(vocab) on
  * the driver — the BPE-argmax discipline (bounded by construction).
  *
  * The DuckDB oracle unrolls the IDENTICAL computation — same seed
  * explode, same M-position DP chain, same backtrack fold, same
  * prune/floor/re-score — K rounds deep ([[oracleSql]] generates it
  * mechanically, as [[BpeTrain.oracleSql]] does for merge rounds).
  */
object UnigramLm {

  /** Max piece length considered (SentencePiece's
    * max_sentencepiece_length discipline, scaled to the test corpus).
    */
  val P = 4
  /** Max word length trained on — longer words are pathological
    * strings, excluded IDENTICALLY in both engines (the DP unroll
    * depth; a constant so the oracle SQL needs no data peek).
    */
  val M = 16
  /** Multi-char seed vocabulary budget (top-V by freq). */
  val V = 24
  /** Hard-EM rounds. */
  val K = 2

  /** piece → (freq, qlp): one live vocabulary state. */
  type Vocab = Seq[(String, Long, Long)]

  /** bits in x's binary form = ⌊log₂x⌋+1 for x ≥ 1 — matches DuckDB's
    * length(bin(x)) exactly.
    */
  private[text] def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  private def rescore(kept: Seq[(String, Long)]): Vocab = {
    val t = kept.map(_._2).sum
    kept.map { case (p, f) => (p, f, bitlen(f) - bitlen(t) - 1L) }
  }

  /** Distinct-word frequency table (w, cnt), words ≤ M chars. */
  private[text] def wordTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) <= M)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Seed vocabulary: every substring of length 1..P of every distinct
    * word, freq = Σ wordcnt × occurrences (overlapping counted); all
    * singles + top-V multis. The explode fans out ≤ M·P pieces per
    * word; the aggregate is map-side combined on the piece key.
    */
  private[text] def seedVocab(words: DataFrame): Vocab = {
    val subs = words.select(col("cnt"), explode(expr(
      s"flatten(transform(sequence(1, length(w)), s -> " +
        s"transform(sequence(1, least($P, length(w) - s + 1)), l -> substring(w, s, l))))"))
      .as("piece"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
      .localCheckpoint()
    val singles = subs.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val multis = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(V)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    rescore((singles ++ multis).sortBy(_._1))
  }

  /** Viterbi segmentation of every word under `scores`: the DP is ONE
    * `aggregate` fold over positions 1..M (per-row, no UDF, no
    * shuffle; the score map rides along as a literal) — a fold, not M
    * stacked projections, because alias inlining would otherwise blow
    * the plan up exponentially in P (each b_j references P previous
    * b_i's; the optimizer inlines, ~P^M nodes — measured OOM at M=16).
    * As a fold the candidate construction appears ONCE: tree size
    * O(P). Backtrack is a second M-step fold over the finished table.
    * Adds `pieces` (array<string>, the best path in stream order).
    */
  private[text] def segmented(words: DataFrame, scores: Map[String, Long]): DataFrame = {
    val m = typedlit(scores)
    val w = col("w")
    // The fold accumulator must stay NON-NULLABLE end to end: a HOF's
    // result type is fixed by its zero, and appending a nullable
    // element into a containsNull=false accumulator NPEs inside the
    // UnsafeProjection. So unreachable positions carry a SENTINEL
    // state (score −2⁴⁰) instead of null — every real path scores
    // ≥ −64·M, so a sentinel never wins a reachable position's argmax.
    val deadScore = -(1L << 40)
    val sentinel = struct(lit(deadScore).as("s"), lit(0L).as("np"), lit(0L).as("ni"))
    // bests[pos+1] = best path state ending at position pos; element
    // struct order (s, np, ni) IS the tie chain: max score, then
    // fewest pieces, then longest last piece (array_max skips nulls)
    val bests = aggregate(
      sequence(lit(1), lit(M)),
      array(struct(lit(0L).as("s"), lit(0L).as("np"), lit(0L).as("ni"))),
      (acc, j) => {
        val cands: Seq[Column] = (1 to P).map { d =>
          val i = j - d
          val prev = element_at(acc, (i + 1).cast("int"))
          val sc = element_at(m, w.substr((i + 1).cast("int"), lit(d)))
          when(j <= length(w) && i >= 0 &&
            prev.getField("s") > lit(deadScore / 2) && sc.isNotNull,
            struct((prev.getField("s") + sc).as("s"),
              (prev.getField("np") - 1L).as("np"),
              (-i).cast("long").as("ni")))
        }
        concat(acc, array(coalesce(array_max(array(cands: _*)), sentinel)))
      })
    val backtrack = aggregate(
      sequence(lit(1), lit(M)),
      struct(length(w).cast("long").as("pos"),
        array().cast("array<string>").as("pieces")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val pred = coalesce(
          -element_at(col("bl"), (pos + 1).cast("int")).getField("ni"), lit(0L))
        when(pos > 0,
          struct(pred.as("pos"),
            concat(
              array(coalesce(
                w.substr((pred + 1).cast("int"), (pos - pred).cast("int")), lit(""))),
              acc.getField("pieces")).as("pieces")))
          .otherwise(acc)
      })
    words.withColumn("bl", bests)
      .withColumn("pieces", backtrack.getField("pieces"))
      .select("w", "cnt", "pieces")
  }

  /** One E+M round: usage-count the best paths, prune dead multis,
    * floor singles, re-score. The usage aggregate lands ≤ |vocab| rows
    * on the driver — bounded by construction.
    */
  private[text] def emRound(words: DataFrame, vocab: Vocab): Vocab = {
    val scores = vocab.map(v => v._1 -> v._3).toMap
    val usage = segmented(words, scores)
      .select(col("cnt"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("usage"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = vocab.flatMap { case (p, _, _) =>
      val u = usage.getOrElse(p, 0L)
      if (p.length == 1) Some(p -> math.max(u, 1L))
      else if (u > 0L) Some(p -> u)
      else None
    }
    rescore(kept)
  }

  /** The full alternation: seed, then K hard-EM rounds; returns every
    * state (index 0 = seed) so specs can pin the whole trajectory.
    * `checkpoint = false` when the caller already materialized the word
    * table (avoids a redundant second block-storage copy).
    */
  private[text] def trainRounds(words: DataFrame, k: Int = K,
                                checkpoint: Boolean = true): Seq[Vocab] = {
    val w = if (checkpoint) words.localCheckpoint() else words
    val states = scala.collection.mutable.ArrayBuffer(seedVocab(w))
    for (_ <- 1 to k) states += emRound(w, states.last)
    states.toSeq
  }

  /** `text_unigram_train`: the final vocabulary (piece, freq, qlp). */
  def textUnigramTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    trainRounds(wordTable(spark, sfDir)).last
      .toDF("piece", "freq", "qlp")
      .orderBy(col("freq").desc, col("piece"))
  }

  /** `text_unigram_encode`: per-document word/piece counts under the
    * trained vocabulary — the compression check before committing a
    * tokenizer. Vocab-side work is O(distinct words); the doc side is
    * one extract-explode + a word-keyed join with the small side
    * broadcastable (the [[BpeTrain.textBpeEncode]] shape).
    */
  def textUnigramEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val words = wordTable(spark, sfDir).localCheckpoint()
    val finalVocab = trainRounds(words, checkpoint = false).last
    val wt = segmented(words, finalVocab.map(v => v._1 -> v._3).toMap)
      .select(col("w"), size(col("pieces")).cast("long").as("np"))
    val docWords = words.sparkSession.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) <= M)
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    docWords.join(wt, "w")
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), sum(col("c") * col("np")).as("n_pieces"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ oracle

  /** The DP unroll + backtrack fold for one vocabulary state, as
    * DuckDB CTEs: vocab_cte(piece,freq,qlp) + words → seg_tag(w, cnt,
    * pieces). Mirrors [[segmented]] position for position.
    */
  private def viterbiCtes(tag: String, vocabCte: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"m_$tag AS (SELECT map(list(piece), list(qlp)) AS m FROM $vocabCte)"
    parts += s"v0_$tag AS (SELECT w, cnt, m, {'s': 0, 'np': 0, 'ni': 0} AS b0 FROM words, m_$tag)"
    for (j <- 1 to M) {
      val cands = (math.max(0, j - P) until j).map { i =>
        val piece = s"substring(w, ${i + 1}, ${j - i})"
        s"CASE WHEN len(w) >= $j AND b$i IS NOT NULL AND m[$piece][1] IS NOT NULL " +
          s"THEN {'s': b$i.s + m[$piece][1], 'np': b$i.np - 1, 'ni': ${-i}} END"
      }
      parts += s"v${j}_$tag AS (SELECT *, list_aggregate([${cands.mkString(", ")}], 'max') AS b$j FROM v${j - 1}_$tag)"
    }
    val bl = (1 to M).map(j => s"b$j").mkString(", ")
    parts += s"bl_$tag AS (SELECT w, cnt, [$bl] AS bl FROM v${M}_$tag)"
    parts += s"t0_$tag AS (SELECT w, cnt, bl, len(w) AS pos, CAST([] AS VARCHAR[]) AS pieces FROM bl_$tag)"
    for (k <- 1 to M) {
      parts += s"t${k}_$tag AS (SELECT w, cnt, bl, " +
        s"CASE WHEN pos > 0 THEN -(bl[pos].ni) ELSE pos END AS pos, " +
        s"CASE WHEN pos > 0 THEN list_prepend(substring(w, -(bl[pos].ni) + 1, pos - (-(bl[pos].ni))), pieces) ELSE pieces END AS pieces " +
        s"FROM t${k - 1}_$tag)"
    }
    parts += s"seg_$tag AS (SELECT w, cnt, pieces FROM t${M}_$tag)"
    parts.toSeq
  }

  /** One M-step as CTEs: seg_tag → vocab_r (usage, prune, floor,
    * re-score) — mirrors [[emRound]].
    */
  private def mStepCtes(r: Int, prevVocab: String, seg: String): Seq[String] = Seq(
    s"u_$r AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS usage FROM " +
      s"(SELECT unnest(pieces) AS piece, cnt FROM $seg) GROUP BY 1)",
    s"kept_$r AS (SELECT v.piece, CASE WHEN len(v.piece) = 1 THEN greatest(coalesce(u.usage, 0), 1) " +
      s"ELSE coalesce(u.usage, 0) END AS freq " +
      s"FROM $prevVocab v LEFT JOIN u_$r u ON v.piece = u.piece " +
      s"WHERE len(v.piece) = 1 OR coalesce(u.usage, 0) > 0)",
    s"tt_$r AS (SELECT CAST(sum(freq) AS BIGINT) AS t FROM kept_$r)",
    s"vocab_$r AS (SELECT piece, freq, CAST(length(bin(freq)) - length(bin(t)) - 1 AS BIGINT) AS qlp FROM kept_$r, tt_$r)")

  /** Shared seed + K-round chain (words, vocab_0..vocab_K). */
  private def oracleChain(k: Int): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"words AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM " +
      s"(SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents) " +
      s"WHERE len(w) <= $M GROUP BY 1)"
    parts += s"sub AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM " +
      s"(SELECT unnest(flatten([[substring(w, s, l) for l in generate_series(1, least($P, len(w) - s + 1))] " +
      s"for s in generate_series(1, len(w))])) AS piece, cnt FROM words) GROUP BY 1)"
    parts += s"singles AS (SELECT piece, freq FROM sub WHERE len(piece) = 1)"
    parts += s"multis AS (SELECT piece, freq FROM sub WHERE len(piece) >= 2 ORDER BY freq DESC, piece LIMIT $V)"
    parts += s"kept_0 AS (SELECT * FROM singles UNION ALL SELECT * FROM multis)"
    parts += s"tt_0 AS (SELECT CAST(sum(freq) AS BIGINT) AS t FROM kept_0)"
    parts += s"vocab_0 AS (SELECT piece, freq, CAST(length(bin(freq)) - length(bin(t)) - 1 AS BIGINT) AS qlp FROM kept_0, tt_0)"
    for (r <- 1 to k) {
      parts ++= viterbiCtes(s"r$r", s"vocab_${r - 1}")
      parts ++= mStepCtes(r, s"vocab_${r - 1}", s"seg_r$r")
    }
    parts.toSeq
  }

  /** `text_unigram_train` oracle: the identical alternation unrolled. */
  def oracleSql(k: Int = K): String =
    s"WITH ${oracleChain(k).mkString(",\n")}\n" +
      s"SELECT piece, freq, qlp FROM vocab_$k ORDER BY freq DESC, piece"

  /** `text_unigram_encode` oracle: one more Viterbi pass under the
    * final vocabulary, re-joined to the per-(doc, word) table.
    */
  def oracleSqlEncode(k: Int = K): String = {
    val parts = oracleChain(k) ++ viterbiCtes("enc", s"vocab_$k") ++ Seq(
      "wt AS (SELECT w, CAST(len(pieces) AS BIGINT) AS np FROM seg_enc)",
      s"dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM " +
        s"(SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents) " +
        s"WHERE len(w) <= $M GROUP BY 1, 2)")
    s"WITH ${parts.mkString(",\n")}\n" +
      "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, CAST(sum(c * np) AS BIGINT) AS n_pieces " +
      "FROM dw JOIN wt USING (w) GROUP BY doc_id ORDER BY doc_id"
  }
}
