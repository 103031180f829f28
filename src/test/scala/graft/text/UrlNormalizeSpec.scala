package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlNormalizeSpec extends SparkSpec {

  test("planted variants collapse: strictly more raw spellings than " +
    "canonical keys, and multi-form keys exist") {
    val out = UrlNormalize.textUrlNormalize(spark, sf0001).collect()
    assert(out.nonEmpty)
    // the plant fires variant rules (case every 7th, :443 every 3rd,
    // fragment every 5th, &ref every 2nd) — so the raw-form space is
    // strictly larger than the canonical key space
    val totalRawForms = out.map(_.getLong(2)).sum
    assert(totalRawForms > out.length,
      s"raw forms ($totalRawForms) must exceed canonical keys (${out.length})")
    assert(out.exists(_.getLong(2) > 1L),
      "no canonical key absorbed multiple raw spellings — nothing collapsed")
  }

  test("normalize collapses case, https :443, fragment, utm params, param order") {
    import spark.implicits._
    val raws = Seq(
      "HTTPS://News.Example.COM:443/a/b?utm_source=x&z=1&a=2#frag",
      "https://news.example.com/a/b?a=2&z=1").toDF("url")
    val norms = raws.select(UrlNormalize.normalize(col("url"))).as[String].collect()
    assert(norms.toSet == Set("https://news.example.com/a/b?a=2&z=1"),
      s"variants must canonicalize identically, got ${norms.toSet}")
  }

  test("port strip is scheme-gated: http://host:443 is NOT the same resource " +
    "as http://host, but http://host:80 is") {
    import spark.implicits._
    val norms = Seq("http://h.example.com:443/p", "http://h.example.com/p",
      "http://h.example.com:80/p")
      .toDF("url").select(UrlNormalize.normalize(col("url"))).as[String].collect()
    assert(norms(0) == "http://h.example.com:443/p", ":443 under http must survive")
    assert(norms(1) == "http://h.example.com/p")
    assert(norms(2) == "http://h.example.com/p", ":80 under http must strip")
  }

  test("oracle parity: DuckDB-shaped SQL replay of the plant+normalize " +
    "census equals the engine (Spark-SQL dialect subset)") {
    // the plant and normalization are deliberately expressible in both
    // dialects; here replay the PLANT in SQL and re-normalize with the
    // engine's own column fn — pins the plant SQL text in oracleSql
    // against the Scala plant (drift in either side breaks this).
    val planted = UrlNormalize.plantedUrls(spark, sf0001)
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("documents")
    val sqlPlant = spark.sql(
      """SELECT doc_id,
        |  concat(
        |   CASE WHEN doc_id % 11 = 0
        |        THEN (CASE WHEN doc_id % 7 = 0 THEN 'HTTP://' ELSE 'http://' END)
        |        ELSE (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END) END,
        |   CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END,
        |   '.Example.COM',
        |   CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END,
        |   '/articles/', CAST(doc_id % 100 AS STRING),
        |   '?utm_source=feed&id=', CAST(doc_id % 50 AS STRING),
        |   CASE WHEN doc_id % 2 = 0 THEN '&ref=home' ELSE '' END,
        |   CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
        |FROM documents""".stripMargin)
    assert(planted.except(sqlPlant).isEmpty && sqlPlant.except(planted).isEmpty,
      "Scala plant and SQL plant must be row-identical")
  }

  test("dedup_url: survivor economics conserve docs, keepers are min doc_id, " +
    "and dropped = docs - canonical keys per host") {
    val out = UrlNormalize.dedupUrl(spark, sf0001).collect()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.map(_.getLong(2)).sum == total, "every doc lands under exactly one host")
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1),
        s"${r.getString(0)}: dropped must equal docs - canonical urls")
    }
    assert(out.map(_.getLong(3)).sum > 0, "the plant guarantees real duplicates")
    // keeper rule: the min surviving doc per host is the min doc over
    // that host's canonical groups — replay one host
    val canon = UrlNormalize.plantedUrls(spark, sf0001)
      .select(col("doc_id"), UrlNormalize.normalize(col("url")).as("nu"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val host = out.head.getString(0)
    val expectMin = canon.filter(_._2.contains(s"://$host/")).map(_._1).min
    assert(out.head.getLong(4) == expectMin,
      s"$host: min_survivor_doc must be the min doc_id of the host's groups")
  }

  test("census is exact: n_docs sums to corpus size; http :443 keys exist " +
    "and stay separate from their portless siblings") {
    val out = UrlNormalize.textUrlNormalize(spark, sf0001).collect()
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.map(_.getLong(1)).sum == total, "every doc lands in exactly one key")
    val keys = out.map(_.getString(0)).toSet
    val surviving443 = keys.filter(k => k.startsWith("http://") && k.contains(":443"))
    assert(surviving443.nonEmpty,
      "plant guarantees http://…:443 resources (doc_id % 33 == 0 docs) — " +
        "the scheme gate must NOT strip :443 under http")
    assert(!keys.exists(k => k.startsWith("https://") && k.contains(":443")),
      ":443 under https is the default port and must always strip")
  }
}
