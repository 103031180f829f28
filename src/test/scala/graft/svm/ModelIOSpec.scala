package graft.svm

import org.scalatest.funsuite.AnyFunSuite

class ModelIOSpec extends AnyFunSuite {

  test("save/load through the Hadoop FileSystem API round-trips") {
    val spark = graft.SparkSpec.session
    val (data, m) = toyModel()
    val path = java.nio.file.Files.createTempDirectory("graft-model-").toString + "/model.txt"
    ModelIO.save(spark, m, path)
    val loaded = ModelIO.load(spark, path)
    assert(loaded.supportVectors.length == m.supportVectors.length)
    data.foreach(d => assert(loaded.predict(d.features) == m.predict(d.features)))
  }

  private def toyModel(): (Array[LabeledVec], SvmModel) = {
    val data = (for {
      c <- 0 until 3
      i <- 0 until 12
    } yield LabeledVec(c, Array(c * 2f + (i % 3) * 0.1f, c * -1.5f + (i / 3) * 0.1f))).toArray
    (data, Smo.train(data, Smo.Params(kernel = Kernel.Rbf(0.8))))
  }

  test("serialize emits the LibSVM header contract") {
    val (_, m) = toyModel()
    val text = ModelIO.serialize(m)
    val lines = text.split("\n")
    assert(lines(0) == "svm_type c_svc")
    assert(lines(1) == "kernel_type rbf")
    assert(lines.exists(_.startsWith("gamma 0.8")))
    assert(lines.exists(_.startsWith("nr_class 3")))
    assert(lines.exists(_.startsWith("rho ")))
    assert(lines.exists(_.startsWith("label 0 1 2")))
    assert(lines.exists(_.startsWith("nr_sv ")))
    assert(lines.exists(_ == "SV"))
    val totalSv = lines.find(_.startsWith("total_sv")).get.split(" ")(1).toInt
    assert(totalSv == m.supportVectors.length)
  }

  test("round-trip preserves predictions") {
    val (data, m) = toyModel()
    val parsed = ModelIO.parse(ModelIO.serialize(m))
    val probes = data.map(_.features) ++ Array(Array(0.5f, 0.5f), Array(3f, -4f), Array(-1f, 1f))
    probes.foreach { x =>
      assert(parsed.predict(x) == m.predict(x), s"mismatch at ${x.toSeq}")
    }
  }

  test("round-trip preserves SV class grouping and counts") {
    val (_, m) = toyModel()
    val parsed = ModelIO.parse(ModelIO.serialize(m))
    assert(parsed.supportVectors.length == m.supportVectors.length)
    assert(parsed.labels.toSeq == m.labels.toSeq)
    val byLabel = m.supportVectors.groupBy(_.label).view.mapValues(_.length).toMap
    val parsedByLabel = parsed.supportVectors.groupBy(_.label).view.mapValues(_.length).toMap
    assert(byLabel == parsedByLabel)
  }
}
