package graft.sources

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class BinaryFilesSpec extends SparkSpec {

  test("blob round-trip: write per-row files, binaryFile read recovers ids and bytes") {
    val dir = java.nio.file.Files.createTempDirectory("binfiles").toString
    val ppm = Multimodal.ppmTable(spark, sf0001)
      .select(col("media_id"), col("payload")).filter(col("media_id") < 40)
    BinaryFiles.writeBlobs(ppm, "media_id", "payload", dir, "img_", "ppm")

    val back = BinaryFiles.readBlobs(spark, dir, "img_", "ppm")
    val got = back.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val expect = ppm.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got == expect, "every blob must round-trip byte-exactly with its id")

    // length column comes from the listing and must equal content size
    assert(back.filter(col("length") =!= org.apache.spark.sql.functions.length(col("content")))
      .count() == 0)
  }

  test("pathGlobFilter prunes at LISTING: non-matching files are never read") {
    val dir = java.nio.file.Files.createTempDirectory("binfiles2").toString
    val ppm = Multimodal.ppmTable(spark, sf0001)
      .select(col("media_id"), col("payload")).filter(col("media_id") < 20)
    BinaryFiles.writeBlobs(ppm, "media_id", "payload", dir, "img_", "ppm")
    BinaryFiles.writeBlobs(ppm, "media_id", "payload", dir, "junk_", "tmp")

    val df = BinaryFiles.readBlobs(spark, dir, "img_", "ppm")
    assert(df.count() == 20, "only the matching extension is listed")
    // digit-bearing extensions and digit-ending prefixes must parse:
    // the id regex anchors on the exact prefix/ext pair
    BinaryFiles.writeBlobs(ppm, "media_id", "payload", dir, "v2_", "mp4")
    val tricky = BinaryFiles.readBlobs(spark, dir, "v2_", "mp4")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(tricky.toSeq == (0L until 20L), s"ids must survive v2_/mp4 naming: ${tricky.take(5).mkString(",")}")
    // pruning is structural: the file index never surfaces .tmp paths
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.endsWith(".ppm")),
      s"glob must prune at the file index: ${files.take(3).mkString(", ")}")
  }

  test("binaryFile feeds the real decode path end to end") {
    val dir = java.nio.file.Files.createTempDirectory("binfiles3").toString
    // media_id % 13 == 0 rows are deliberately truncated payloads in
    // ppmTable; exclude them for the decode leg
    val ppm = Multimodal.ppmTable(spark, sf0001)
      .select(col("media_id"), col("payload"))
      .filter(col("media_id") < 40 && pmod(col("media_id"), lit(13)) =!= 0)
    BinaryFiles.writeBlobs(ppm, "media_id", "payload", dir, "img_", "ppm")
    import spark.implicits._
    val decodedOk = BinaryFiles.readBlobs(spark, dir, "img_", "ppm")
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, graft.multimodal.Ppm.decode(bytes).isDefined)
      })
      .filter(_._2).count()
    assert(decodedOk == ppm.count(),
      "every ingested blob must decode through the standard Ppm path")
  }
}
