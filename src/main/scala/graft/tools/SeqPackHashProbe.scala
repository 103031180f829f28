package graft.tools

import org.apache.spark.sql.SparkSession

/** Canonical-value probe for the round-7 `corpus_seqpack` driver-gate
  * hash flake (CORRECTNESS_r07: rows+schema match, hash_match false —
  * not reproducible by either the builder's or the judge's fresh runs).
  *
  * The query is exact-integer end to end (regexp token counts →
  * two-level prefix sum → div/mod span arithmetic → long aggregates)
  * over pure-printable-ASCII documents (verified: zero `\x0B`, zero
  * non-ASCII at sf0.001/0.01/0.1, so the one known Java-vs-RE2 `\s`
  * divergence — vertical tab — cannot fire). Any run-to-run value
  * difference would therefore be a bug, not noise; this probe makes a
  * single run auditable value-by-value:
  *
  *   1. prints every histogram row in canonical `col=value` form
  *      (columns sorted by name, rows by n_spans);
  *   2. prints an ORDER-INSENSITIVE digest (sum of per-row FNV-1a
  *      over the canonical row string) so two runs — or a run vs a
  *      driver artifact — can be compared with one number;
  *   3. recomputes the histogram FROM the manifest (group the
  *      per-(doc,sequence) spans by doc, count spans, sum span_len)
  *      and asserts it is value-identical to the direct histogram —
  *      the refinement consistency the round-7 adjudication argued.
  *
  * Usage: runMain graft.tools.SeqPackHashProbe [sfDir]
  */
object SeqPackHashProbe {
  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect()
        .map(r => cols.indices.map(i => s"${cols(i)}=${r.get(i)}").mkString("|"))
        .sorted.toSeq
    }

    val hist = graft.text.SeqPack.corpusSeqPack(spark, sfDir)
    val histRows = canon(hist)
    println("== corpus_seqpack (direct) ==")
    histRows.foreach(r => println(s"  $r"))
    println(f"DIGEST_DIRECT=${histRows.map(fnv1a).sum}%016x")

    // Refinement cross-check: histogram reconstructed from the manifest.
    val manifest = graft.text.SeqPack.seqPackManifest(spark, sfDir)
    val fromManifest = manifest.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("span_len").as("nt"))
      .groupBy("n_spans")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val manRows = canon(fromManifest)
    println("== corpus_seqpack (recomputed from manifest) ==")
    manRows.foreach(r => println(s"  $r"))
    println(f"DIGEST_FROM_MANIFEST=${manRows.map(fnv1a).sum}%016x")
    println(s"MANIFEST_ROWS=${manifest.count()}")
    println(if (histRows == manRows) "REFINEMENT_CONSISTENT=true"
            else "REFINEMENT_CONSISTENT=FALSE  <-- value bug, investigate")
    spark.stop()
  }
}
