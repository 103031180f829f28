package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {

  import spark.implicits._

  test("each detector finds and redacts its hand-checked examples") {
    val cases = Seq(
      ("mail me at alice.smith+x@sub.example.co today", "email", 1),
      ("hosts 10.0.3.44 and 192.168.0.1 are up", "ipv4", 2),
      ("call +1-555-0042 now", "phone", 1),
      ("ssn 123-45-6789 on file", "ssn", 1))
    cases.foreach { case (text, cat, n) =>
      val (_, pat, tag) = Pii.Categories.find(_._1 == cat).get
      val r = Seq(text).toDF("text")
        .select(
          regexp_count(col("text"), lit(pat)).as("n"),
          Pii.redactAll(col("text")).as("red"))
        .head()
      assert(r.getAs[Int]("n") == n, s"$cat count on '$text'")
      assert(r.getAs[String]("red").contains(tag), s"$cat tag in redaction")
      // redaction is complete: re-scanning the redacted text finds nothing
      val resid = Seq(r.getAs[String]("red")).toDF("text")
        .select(regexp_count(col("text"), lit(pat))).head().getInt(0)
      assert(resid == 0, s"$cat residual")
    }
  }

  test("phone redaction does not strand an SSN-shaped remnant") {
    // +1-555-0042 must be consumed by the phone pattern, not partially
    // matched by the SSN detector (3-3-4 vs 3-2-4 digit grouping)
    val r = Seq("+1-555-0042").toDF("text")
      .select(regexp_count(col("text"), lit(Pii.Categories.find(_._1 == "ssn").get._2)))
      .head().getInt(0)
    assert(r == 0)
  }

  test("planted corpus audit: every plant is counted and fully scrubbed") {
    val rows = Pii.piiScrub(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("category")).toSeq ==
      Seq("email", "ipv4", "phone", "ssn"))
    // 500 docs -> 100 planted (doc_id % 5 == 0), category cycles with
    // doc_id % 4; doc_id % 5 == 0 hits each %4 class 25 times
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matches") == 25L, s"${r.getString(0)} matches")
      assert(r.getAs[Long]("n_docs") == 25L, s"${r.getString(0)} docs")
      assert(r.getAs[Long]("n_residual") == 0L, s"${r.getString(0)} residual")
      assert(r.getAs[Long]("n_chars_redacted") > 0L, s"${r.getString(0)} chars")
    }
  }

  test("pii_redact is SQL-callable and matches the Column form") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("a", "mail x@y.com ip 10.0.0.1 tel +1-555-1234 s 123-45-6789"))
      .toDF("k", "text").createOrReplaceTempView("pii_probe")
    try {
      val viaSql = spark.sql("SELECT pii_redact(text) AS red FROM pii_probe")
        .head().getString(0)
      val viaCol = Seq("mail x@y.com ip 10.0.0.1 tel +1-555-1234 s 123-45-6789")
        .toDF("text").select(Pii.redactAll(col("text"))).head().getString(0)
      assert(viaSql == viaCol)
      assert(viaSql == "mail <EMAIL> ip <IP> tel <PHONE> s <SSN>")
    } finally spark.catalog.dropTempView("pii_probe")
  }

  test("scrub leaves PII-free documents byte-identical") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val joined = Pii.scrub(d).select(col("doc_id"), col("text").as("scrubbed"))
      .join(d.select(col("doc_id"), col("text")), "doc_id")
    assert(joined.filter(col("scrubbed") =!= col("text")).count() == 0)
  }
}
