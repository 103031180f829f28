package graft.svm

import scala.collection.mutable

/** LibSVM text model format serialization — the same on-disk model
  * contract the reference writes to HDFS (an "identical implementation
  * of svm.svm_save_model", cascade_svm/Lastcascade.java:31-104 and
  * Bagging_svm/Bagging1.java:23-103), so a LibSVM user could load the
  * model produced by this engine.
  *
  * Layout (LibSVM): SVs are grouped by class in label order; each SV
  * carries nr_class-1 coefficients. For the binary machine (class i vs
  * class j, i<j), the alpha*y values of SVs belonging to class i are
  * stored at coefficient slot j-1, and those of class j at slot i.
  */
object ModelIO {

  /** Persist a model in LibSVM text format through the Hadoop
    * FileSystem API — the same call shape works for file://, hdfs://
    * or object stores on a real cluster (reference:
    * cascade_svm/Lastcascade.java:33-36 writes via FileSystem.create).
    */
  def save(spark: org.apache.spark.sql.SparkSession, m: SvmModel, path: String): Unit =
    save(spark.sparkContext.hadoopConfiguration, m, path)

  /** Configuration-based variant usable from INSIDE an executor task
    * (where no SparkSession exists) — the call shape bagging uses to
    * persist each base model from the task that trained it, exactly as
    * the reference's mapper writes model-&lt;taskId&gt;.model
    * (Bagging_svm/Bagging1.java:107-132).
    */
  def save(conf: org.apache.hadoop.conf.Configuration, m: SvmModel, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(serialize(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a model previously written by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): SvmModel =
    load(spark.sparkContext.hadoopConfiguration, path)

  /** Configuration-based variant of [[load]] (see the save overload). */
  def load(conf: org.apache.hadoop.conf.Configuration, path: String): SvmModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      parse(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  def serialize(m: SvmModel): String = {
    val sb = new StringBuilder
    val nrClass = m.labels.length
    sb ++= "svm_type c_svc\n"
    sb ++= s"kernel_type ${m.kernel.name}\n"
    m.kernel match {
      case Kernel.Rbf(g) => sb ++= s"gamma $g\n"
      case _             =>
    }
    // group SVs by class, label order (libsvm layout)
    val order: Array[Int] = m.labels.flatMap { lbl =>
      m.supportVectors.indices.filter(i => m.supportVectors(i).label == lbl)
    }
    val pos = order.zipWithIndex.toMap // old sv idx -> new position
    val nSv = m.labels.map(lbl => m.supportVectors.count(_.label == lbl))

    sb ++= s"nr_class $nrClass\n"
    sb ++= s"total_sv ${m.supportVectors.length}\n"
    sb ++= ("rho" + m.binaries.map(b => s" ${b.rho}").mkString + "\n")
    sb ++= ("label" + m.labels.map(l => s" $l").mkString + "\n")
    sb ++= ("nr_sv" + nSv.map(n => s" $n").mkString + "\n")

    // coefficient matrix [nr_class-1][total_sv]
    val coef = Array.fill(math.max(nrClass - 1, 1), m.supportVectors.length)(0.0)
    val labelIdx = m.labels.zipWithIndex.toMap
    m.binaries.foreach { b =>
      val i = labelIdx(b.posLabel); val j = labelIdx(b.negLabel)
      b.svLocal.indices.foreach { t =>
        val svOld = b.svLocal(t)
        val p = pos(svOld)
        val slot = if (m.supportVectors(svOld).label == b.posLabel) j - 1 else i
        coef(slot)(p) = b.alphaY(t)
      }
    }

    sb ++= "SV\n"
    order.foreach { old =>
      val p = pos(old)
      val coefs = (0 until math.max(nrClass - 1, 1)).map(s => coef(s)(p)).mkString(" ")
      val feats = m.supportVectors(old).features.zipWithIndex
        .map { case (v, i) => s"${i + 1}:$v" }.mkString(" ")
      sb ++= s"$coefs $feats\n"
    }
    sb.result()
  }

  /** Parse a model back; inverse of [[serialize]] for this engine's output. */
  def parse(text: String): SvmModel = {
    val lines = text.split("\n").iterator
    var kernelName = "rbf"; var gamma = 0.0
    var labels = Array.empty[Int]; var nSv = Array.empty[Int]
    var rho = Array.empty[Double]; var totalSv = 0
    var done = false
    while (!done && lines.hasNext) {
      val line = lines.next()
      val parts = line.split(" ")
      parts(0) match {
        case "svm_type"    =>
        case "kernel_type" => kernelName = parts(1)
        case "gamma"       => gamma = parts(1).toDouble
        case "nr_class"    =>
        case "total_sv"    => totalSv = parts(1).toInt
        case "rho"         => rho = parts.tail.map(_.toDouble)
        case "label"       => labels = parts.tail.map(_.toInt)
        case "nr_sv"       => nSv = parts.tail.map(_.toInt)
        case "SV"          => done = true
        case _             =>
      }
    }
    val nrClass = labels.length
    val svs = mutable.ArrayBuffer.empty[LabeledVec]
    val coef = mutable.ArrayBuffer.empty[Array[Double]]
    // class of each SV position derives from nr_sv blocks
    val classOfPos: Array[Int] = labels.indices.flatMap(i => Array.fill(nSv(i))(i)).toArray
    var p = 0
    while (lines.hasNext && p < totalSv) {
      val parts = lines.next().trim.split(" ").filter(_.nonEmpty)
      val nCoef = math.max(nrClass - 1, 1)
      coef += parts.take(nCoef).map(_.toDouble)
      val feats = parts.drop(nCoef).map { kv =>
        kv.split(":")(1).toFloat
      }
      svs += LabeledVec(labels(classOfPos(p)), feats)
      p += 1
    }
    val kernel: Kernel = if (kernelName == "linear") Kernel.Linear else Kernel.Rbf(gamma)
    // rebuild binary machines from the coefficient layout
    val binaries = mutable.ArrayBuffer.empty[BinarySvm]
    var r = 0
    val start = labels.indices.map(i => labels.indices.take(i).map(nSv).sum).toArray
    for {
      i <- labels.indices
      j <- (i + 1) until nrClass
    } {
      val idxI = (start(i) until start(i) + nSv(i)).toArray
      val idxJ = (start(j) until start(j) + nSv(j)).toArray
      val svIdx = idxI.map(t => (t, coef(t)(j - 1))) ++ idxJ.map(t => (t, coef(t)(i)))
      val nz = svIdx.filter { case (_, c) => c != 0.0 }
      binaries += BinarySvm(
        alphaY = nz.map(_._2),
        svLocal = nz.map(_._1),
        rho = rho(r),
        posLabel = labels(i),
        negLabel = labels(j))
      r += 1
    }
    SvmModel(
      labels = labels,
      supportVectors = svs.toArray,
      svGlobalIdx = Array.empty,
      binaries = binaries.toArray,
      kernel = kernel,
      c = 1.0)
  }
}
