package graft.tools

import org.apache.spark.sql.SparkSession

/** Timeline of a ChainedState bounded replay (round-15, guide §1):
  * runs `stream_bitmap_distinct` (representative of the 5-row sketch
  * family) and reconstructs the per-micro-batch cadence from the state
  * dirs' file mtimes — how much of the query is feed write, stream
  * machinery, and each fold's read+merge+write.
  */
object ChainPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (rnd <- 1 to 2) {
      val t0 = System.currentTimeMillis()
      val out = graft.streaming.BitmapStream.runBitmapBounded(spark, sfDir)
      out.collect()
      val t1 = System.currentTimeMillis()
      println(f"CHAINPHASE ---- round $rnd total ${(t1 - t0) / 1e3}%.2f s")
      val root = new java.io.File(graft.streaming.BitmapStream.lastStateRoot)
      val base = root.getParentFile
      def stamp(f: java.io.File): Long =
        Option(f.listFiles).toSeq.flatten.map(_.lastModified).maxOption.getOrElse(f.lastModified)
      val feed = new java.io.File(base, "feed")
      println(f"CHAINPHASE feed_done +${(stamp(feed) - t0) / 1e3}%.2f s")
      val states = Option(root.listFiles).toSeq.flatten
        .sortBy(f => (f.getName.length, f.getName))
      states.foreach { d =>
        println(f"CHAINPHASE ${d.getName} +${(stamp(d) - t0) / 1e3}%.2f s")
      }
    }
    spark.stop()
  }
}
