package graft

import java.nio.file.{Files, Paths}
import graft.streaming.NmeaStream

class NmeaStreamSpec extends SparkSpec {

  test("file-source stream parses arriving log files and aggregates per minute") {
    val dir = Files.createTempDirectory("nmea-stream").toString
    val stream = NmeaStream.minuteStats(NmeaStream.parsedStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("nmea_minutes")
      .outputMode("append").start()
    try {
      // first file arrives
      Files.write(Paths.get(dir, "a.nmea"),
        NmeaFixture.day1.mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
      // a later file pushes the watermark past the first minutes
      val lateBody = "GPRMC,180000.00,A,4739.1234,N,12225.5678,W,5.0,210.0,121022,,,A"
      Files.write(Paths.get(dir, "b.nmea"),
        NmeaFixture.sentence(lateBody).getBytes("UTF-8"))
      q.processAllAvailable()
      val out = spark.table("nmea_minutes").collect()
      assert(out.nonEmpty, "closed minute windows must be emitted")
      out.foreach { r =>
        assert(r.getLong(1) > 0)
        assert(r.getDouble(2) <= r.getDouble(3), "avg <= max")
      }
    } finally q.stop()
  }
}
