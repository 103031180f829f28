package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style tests for the custom codegen expressions: the
  * generated Java (whole-stage codegen path) and the interpreted
  * `nullSafeEval` path must agree with a plain Scala reference
  * implementation on arbitrary vectors — the two execution paths are
  * hand-written twice, so this is the spec that keeps them honest.
  * (Seeded random cases; deterministic run to run.)
  */
class VectorExpressionsPropSpec extends SparkSpec {

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    (0 until n).map(i => a(i).toDouble * b(i).toDouble).sum
  }

  private def run(codegen: Boolean, cases: Seq[(Array[Float], Array[Float])]): Seq[(Double, Double, Double)] = {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.factoryMode",
      if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("i", "a", "b").orderBy("i")
        .select(
          VectorOps.dot(col("a"), col("b")),
          VectorOps.cosine(col("a"), col("b")),
          VectorOps.distSq(col("a"), col("b")))
        .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("codegen and interpreted paths agree with the reference on random vectors") {
    val rnd = new scala.util.Random(20260812L)
    val cases: Seq[(Array[Float], Array[Float])] = (1 to 40).map { _ =>
      val n = 1 + rnd.nextInt(16)
      def vec() = Array.fill(n)((rnd.nextFloat() - 0.5f) * 200f)
      (vec(), vec())
    } :+ ((Array(0f, 0f, 0f), Array(1f, 2f, 3f)))  // zero-norm guard case

    val expected = cases.map { case (a, b) =>
      val dot = refDot(a, b)
      val nn = math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b))
      val cos = if (nn == 0.0) 0.0 else dot / nn
      val dist = a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
      (dot, cos, dist)
    }

    for (codegen <- Seq(true, false)) {
      val got = run(codegen, cases)
      got.zip(expected).zipWithIndex.foreach { case (((d, c, s), (dr, cr, sr)), i) =>
        assert(math.abs(d - dr) <= math.max(1e-9, math.abs(dr) * 1e-12), s"dot case $i codegen=$codegen")
        assert(math.abs(c - cr) <= 1e-9, s"cosine case $i codegen=$codegen")
        assert(math.abs(s - sr) <= math.max(1e-9, sr * 1e-12), s"distSq case $i codegen=$codegen")
      }
    }
  }

  test("shinglesFromTokens equals a sliding-window reference on random token lists") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val words = Array("a", "bb", "ccc", "dd", "e")
    for (_ <- 1 to 30) {
      val toks = List.fill(rnd.nextInt(9))(words(rnd.nextInt(words.length)))
      val n = 1 + rnd.nextInt(4)
      val expected = if (toks.length >= n)
        toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      else Seq.empty
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(graft.dedup.Dedup.tokens(col("text")).as("toks"))
        .select(graft.dedup.Dedup.shinglesFromTokens(col("toks"), n).as("sh"))
        .collect()(0).getSeq[String](0)
      assert(got == expected, s"toks=$toks n=$n")
    }
  }
}
