package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalendarSpec extends SparkSpec {

  test("month cells equal the driver-side java.time replay") {
    val out = Calendar.qCalendar(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = rows.groupBy { case (us, _) =>
      java.time.Instant.ofEpochSecond(us / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.withDayOfMonth(1)
    }.map { case (m0, rs) =>
      val days = rs.map { case (us, _) =>
        java.time.Instant.ofEpochSecond(us / 1000000)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
      }.distinct
      f"${m0.getYear}%04d-${m0.getMonthValue}%02d" ->
        (m0.getYear.toLong, ((m0.getMonthValue - 1) / 3 + 1).toLong,
          m0.getMonthValue.toLong, rs.length.toLong, rs.map(_._2).sum, days.size.toLong)
    }
    assert(out == expected, "calendar cells must equal the java.time replay")
    assert(out.keys.exists(_.endsWith("-12")) || out.size >= 2,
      "the corpus must span multiple calendar months for the pin to bite")
  }
}
