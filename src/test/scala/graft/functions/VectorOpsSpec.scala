package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  private def pairs = {
    import spark.implicits._
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
  }

  test("dot, norm, cosine, distSq match hand-computed values") {
    val r = pairs.select(
      VectorOps.dot(col("a"), col("b")).as("dot"),
      VectorOps.norm(col("a")).as("na"),
      VectorOps.cosine(col("a"), col("b")).as("cos"),
      VectorOps.distSq(col("a"), col("b")).as("d2")).collect()

    assert(math.abs(r(0).getAs[Double]("dot") - 32.0) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("na") - math.sqrt(14)) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("d2") - 27.0) < 1e-9)
    assert(math.abs(r(0).getAs[Double]("cos") - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-9)

    assert(math.abs(r(1).getAs[Double]("cos")) < 1e-9)       // orthogonal
    assert(r(2).getAs[Double]("cos") == 0.0)                 // zero-norm guard
  }

  test("rbf kernel: k(x,x)=1 and decays with distance") {
    val r = pairs.select(
      VectorOps.rbf(col("a"), col("a"), 0.5).as("self"),
      VectorOps.rbf(col("a"), col("b"), 0.5).as("cross")).collect()(0)
    assert(math.abs(r.getAs[Double]("self") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cross") - math.exp(-0.5 * 27.0)) < 1e-9)
  }
}
