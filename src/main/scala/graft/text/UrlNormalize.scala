package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization (SURVEY.md §2c) — the web-corpus dedup-key
  * extractor: crawled URLs arrive in many spellings of the same
  * resource (case-shifted scheme/host, explicit default port,
  * tracking params, fragments, shuffled query order) and URL-level
  * dedup/domain stats are only as good as the canonical form. Rules
  * (the standard canonicalization set): lowercase scheme+host, strip
  * the scheme's OWN default port (:443 only when https, :80 only when
  * http — http://host:443/ is a different resource than http://host/),
  * drop the fragment, drop `utm_*` tracking params, sort surviving
  * params, reassemble.
  *
  * The corpus has no URL column, so the operator PLANTS deterministic
  * raw URLs from doc_id/source (the q_rate_spike plant discipline:
  * variant spellings — upper-cased scheme+host every 7th doc, explicit
  * :443 every 3rd, a fragment every 5th, and an http:// scheme every
  * 11th — so normalization provably COLLAPSES the redundant variants
  * while http://host:443 provably SURVIVES as its own resource, both
  * spec-pinned). Parsing is anchored regex
  * extraction + higher-order array ops (split → filter → sort →
  * join), all codegen'd builtins, no UDF; the SAME regexes run in
  * DuckDB (kept lookahead-free so Java and RE2 semantics coincide).
  *
  * Scale shape: normalization is embarrassingly parallel (one
  * projection); the census is one map-side-combined groupBy on the
  * canonical key — the exact-dedup shape. Output is bounded by the
  * plant's key space, not the corpus.
  */
object UrlNormalize {

  /** Deterministic raw-URL plant over documents — variant spellings
    * of ⌊doc_id/…⌋-keyed resources.
    */
  private[text] def plantedUrls(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        concat(
          when(col("doc_id") % 11 === 0,
            when(col("doc_id") % 7 === 0, lit("HTTP://")).otherwise(lit("http://")))
            .otherwise(
              when(col("doc_id") % 7 === 0, lit("HTTPS://")).otherwise(lit("https://"))),
          when(col("doc_id") % 7 === 0, upper(col("source"))).otherwise(col("source")),
          lit(".Example.COM"),
          when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
          lit("/articles/"), (col("doc_id") % 100).cast("string"),
          lit("?utm_source=feed&id="), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 2 === 0, lit("&ref=home")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#section-2")).otherwise(lit("")))
          .as("url"))

  /** The canonical form — pure builtin string/array ops. */
  private[text] def normalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val auth = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]*)", 1))
    // default-port strip is scheme-gated: :443 is only redundant under
    // https (and :80 under http) — stripping it cross-scheme would
    // collapse distinct resources.
    val host = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val path = regexp_extract(url, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => !(p.startsWith("utm_") || p === ""))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  def textUrlNormalize(spark: SparkSession, sfDir: String): DataFrame =
    plantedUrls(spark, sfDir)
      .select(col("url"), normalize(col("url")).as("norm_url"))
      .groupBy("norm_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_forms"))
      .orderBy("norm_url")

  /** URL-level dedup (`dedup_url`) — the crawl-dedup stage the census
    * above exists FOR: canonicalize, then keep ONE doc per canonical
    * URL (deterministic keeper = min doc_id, the dedup_exact rule) and
    * report the survivor economics per canonical HOST — the number a
    * crawl operator actually reads ("how much of this host's fetch
    * volume was re-spellings"). Same one-projection + one
    * map-side-combined groupBy shape as the census; the host rollup
    * runs on |canonical keys|, not docs.
    */
  def dedupUrl(spark: SparkSession, sfDir: String): DataFrame = {
    val canon = plantedUrls(spark, sfDir)
      .select(col("doc_id"), normalize(col("url")).as("norm_url"))
    val perUrl = canon.groupBy("norm_url")
      .agg(min("doc_id").as("survivor_doc"), count(lit(1)).as("n_docs"))
    perUrl
      .groupBy(regexp_extract(col("norm_url"), "^[a-z]+://([^/]+)", 1).as("host"))
      .agg(
        count(lit(1)).as("n_canonical_urls"),
        sum("n_docs").as("n_docs"),
        (sum("n_docs") - count(lit(1))).as("n_dropped"),
        min("survivor_doc").as("min_survivor_doc"))
      .orderBy("host")
  }

  /** Same plant + normalization + min-doc keeper in DuckDB. */
  val dedupOracleSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 11 = 0
      |          THEN (CASE WHEN doc_id % 7 = 0 THEN 'HTTP://' ELSE 'http://' END)
      |          ELSE (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END)
      |     END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END)
      |    || '.Example.COM'
      |    || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
      |    || '/articles/' || CAST(doc_id % 100 AS VARCHAR)
      |    || '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '&ref=home' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
      |  FROM documents
      |), norm AS (
      |  SELECT doc_id,
      |    scheme || '://'
      |    || (CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
      |             WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$', '')
      |             ELSE auth END)
      |    || regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1)
      |    || (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS norm_url
      |  FROM (
      |    SELECT doc_id, url,
      |      lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      |      lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)) AS auth,
      |      array_to_string(list_sort(list_filter(
      |        string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |        p -> NOT (starts_with(p, 'utm_') OR p = ''))), '&') AS kept
      |    FROM planted
      |  )
      |), per_url AS (
      |  SELECT norm_url, min(doc_id) AS survivor_doc, count(*) AS n_docs
      |  FROM norm GROUP BY 1
      |)
      |SELECT regexp_extract(norm_url, '^[a-z]+://([^/]+)', 1) AS host,
      |  CAST(count(*) AS BIGINT) AS n_canonical_urls,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  CAST(sum(n_docs) - count(*) AS BIGINT) AS n_dropped,
      |  CAST(min(survivor_doc) AS BIGINT) AS min_survivor_doc
      |FROM per_url GROUP BY 1 ORDER BY 1""".stripMargin

  val oracleSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 11 = 0
      |          THEN (CASE WHEN doc_id % 7 = 0 THEN 'HTTP://' ELSE 'http://' END)
      |          ELSE (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END)
      |     END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END)
      |    || '.Example.COM'
      |    || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
      |    || '/articles/' || CAST(doc_id % 100 AS VARCHAR)
      |    || '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '&ref=home' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
      |  FROM documents
      |), norm AS (
      |  SELECT url,
      |    scheme || '://'
      |    || (CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
      |             WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$', '')
      |             ELSE auth END)
      |    || regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1)
      |    || (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS norm_url
      |  FROM (
      |    SELECT url,
      |      lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      |      lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)) AS auth,
      |      array_to_string(list_sort(list_filter(
      |        string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |        p -> NOT (starts_with(p, 'utm_') OR p = ''))), '&') AS kept
      |    FROM planted
      |  )
      |)
      |SELECT norm_url, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms
      |FROM norm GROUP BY 1 ORDER BY 1""".stripMargin
}
