package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  private def oneText(s: String) = {
    import spark.implicits._
    Seq(s).toDF("text")
  }

  test("whitespace and BPE-ish token counts on a hand-checked string") {
    val df = oneText("Hello world, 42 cats!  ")
      .select(
        TextOps.wsTokenCount(col("text")).as("ws"),
        TextOps.bpeishTokenCount(col("text")).as("bpe"))
    val r = df.collect()(0)
    assert(r.getAs[Int]("ws") == 4) // Hello / world, / 42 / cats!
    // letters: Hello, world, cats = 3; digits: 42 = 1; symbols: , ! = 2
    assert(r.getAs[Int]("bpe") == 6)
  }

  test("rolling fingerprint matches a hand-rolled polynomial hash") {
    val s = "ab c"
    val norm = "ab c" // already normalized (single spaces, lowercase)
    val expected = norm.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    val got = oneText(s).select(TextOps.fingerprint(col("text")).as("fp"))
      .collect()(0).getAs[Long]("fp")
    assert(got == expected)
  }

  test("fingerprint normalizes whitespace runs and case") {
    val a = oneText("Foo   Bar\tbaz").select(TextOps.fingerprint(col("text"))).collect()(0).getLong(0)
    val b = oneText("foo bar baz").select(TextOps.fingerprint(col("text"))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("language ID recovers the dominant actual language per prediction") {
    val rows = TextOps.langId(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == 500)
    // for each predicted language, the top actual label should equal it
    // (the synthetic corpus plants marker stopwords per lang)
    val langs = Seq("en", "es", "de", "fr", "zh")
    langs.foreach { l =>
      val preds = rows.filter(_.getAs[String]("pred") == l)
      if (preds.nonEmpty) {
        val top = preds.maxBy(_.getAs[Long]("n"))
        assert(top.getAs[String]("actual") == l,
          s"pred=$l should align with actual=$l: ${preds.mkString(",")}")
      }
    }
  }

  test("quality scores are in-range and consistent on real docs") {
    val rows = TextOps.qualityScores(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      Seq("punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
      assert(r.getAs[Int]("n_tokens") > 0)
    }
  }

  test("RollingHashExpr is bit-identical to the HOF aggregate fold it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Edge inputs: empty, single char, whitespace runs (normalization),
    // BMP unicode (zh markers), punctuation — plus 50 real documents.
    val edge = Seq("", "a", "Hello  World", "  ", "的了是在 test", "a" * 300,
      "MiXeD CaSe 123 !@#").toDF("text")
    val real = spark.read.parquet(s"$sf0001/documents.parquet").select("text").limit(50)
    for (df <- Seq(edge, real)) {
      val norm = lower(regexp_replace(col("text"), "\\s+", " "))
      val legacy = aggregate(
        filter(split(norm, ""), ch => length(ch) > 0),
        lit(0L),
        (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(1000000007L))
      val rows = df.select(
        TextOps.fingerprint(col("text")).as("fp_new"),
        legacy.as("fp_old")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"fingerprint mismatch: new=${r.getLong(0)} old=${r.getLong(1)}"))
    }
    // interpreted path (no codegen) agrees too
    val e = graft.functions.RollingHashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc x"),
        org.apache.spark.sql.types.StringType))
    assert(e.eval(null) == Seq("abc x").toDF("t")
      .select(graft.functions.GraftFunctions.rolling_hash(col("t"))).collect()(0).getLong(0))
  }

  test("corpus filter funnel is monotone and stages reconcile") {
    val r = CorpusFilter.funnel(spark, sf0001).collect()(0)
    val total = r.getAs[Long]("n_total")
    val dedup = r.getAs[Long]("n_after_dedup")
    val quality = r.getAs[Long]("n_after_quality")
    val retained = r.getAs[Long]("n_retained")
    assert(total == 500)
    assert(total >= dedup && dedup >= quality && quality >= retained,
      s"funnel must shrink monotonically: $total >= $dedup >= $quality >= $retained")
    assert(retained > 0, "some English docs must survive the gates")
    // dedup stage must agree with the standalone exact-dedup operator
    val nUnique = graft.dedup.Dedup.exact(spark, sf0001).collect()(0).getAs[Long]("n_unique")
    assert(dedup == nUnique)
  }
}
