package graft

import org.apache.spark.sql.functions._
import graft.marine.{Derived, Nmea}

/** Property tests (SURVEY.md §5 / FIXTURES.md): wind-triangle inverse
  * consistency, checksum involution, coordinate round-trips, haversine
  * bounds. Cases are generated with a fixed seed; column-level math is
  * exercised through Spark in bulk (one job per property, not per case).
  */
class MarinePropertySpec extends SparkSpec {

  test("checksum is XOR-involutive: appending the body twice zeroes it") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString
      assert(NmeaFixture.checksum(s + s) == "00") // x XOR x = 0 per byte
    }
  }

  test("checksum matches the engine's column-level computation") {
    val bodies = Seq(
      "GPRMC,144326.00,A,4739.1234,N,12225.5678,W,5.6,210.3,121022,,,A",
      "IIVHW,208.0,T,194.9,M,5.2,N,9.6,K",
      "IIMWV,042.0,R,11.3,N,A")
    val lines = bodies.map(NmeaFixture.sentence)
    import spark.implicits._
    val parsed = Nmea.parseAll(
      lines.toDF("value").withColumn("line_no", monotonically_increasing_id()))
    assert(parsed.filter(col("valid")).count() == bodies.length)
  }

  test("apparent→true→apparent wind round-trip") {
    import spark.implicits._
    val cases = for {
      aws <- Seq(0.5, 4.0, 11.3, 25.0)
      awa <- Seq(-170.0, -90.0, -30.0, 0.0, 15.0, 42.0, 90.0, 135.0, 180.0)
      bs <- Seq(0.0, 2.5, 5.2, 9.0)
    } yield (aws, awa, bs)
    val df = cases.toDF("aws", "awa", "bs")
      .withColumn("tws", Derived.tws(col("aws"), col("awa"), col("bs")))
      .withColumn("twa", Derived.twa(col("aws"), col("awa"), col("bs")))
      .withColumn("aws2", Derived.awsFromTrue(col("tws"), col("twa"), col("bs")))
      .withColumn("awa2", Derived.awaFromTrue(col("tws"), col("twa"), col("bs")))
    df.collect().foreach { r =>
      val (aws, awa) = (r.getDouble(0), r.getDouble(1))
      val (aws2, awa2) = (r.getDouble(5), r.getDouble(6))
      assert(math.abs(aws2 - aws) < 1e-9, s"aws roundtrip: $r")
      // angle round-trip is mod 360 and undefined when aws2≈0
      if (aws > 1e-6) {
        // angular distance on the circle; 0 = perfect round-trip
        val d = 180.0 - math.abs(math.abs(awa2 - awa) % 360 - 180)
        assert(d < 1e-9, s"awa roundtrip: $r d=$d")
      }
    }
  }

  test("coordinate conversion round-trips degrees → ddmm.mmmm → degrees") {
    import spark.implicits._
    val degs = Seq(0.0, 0.5, 12.3456, 47.652057, 89.9999, 122.42797)
    val asDdmm = degs.map { d =>
      val whole = math.floor(d)
      (d, whole * 100 + (d - whole) * 60)
    }
    val df = asDdmm.toDF("deg", "ddmm")
      .withColumn("back_n", Nmea.coord(col("ddmm").cast("string"), lit("N")))
      .withColumn("back_s", Nmea.coord(col("ddmm").cast("string"), lit("S")))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 1e-9)
      assert(math.abs(r.getDouble(3) + r.getDouble(0)) < 1e-9)
    }
  }

  test("haversine: non-negative, symmetric, triangle inequality on a sample") {
    import spark.implicits._
    val pts = Seq((47.0, -122.0), (47.5, -122.3), (48.1, -121.7))
    val trips = for (a <- pts; b <- pts; c <- pts) yield
      (a._1, a._2, b._1, b._2, c._1, c._2)
    val df = trips.toDF("la", "na", "lb", "nb", "lc", "nc")
      .withColumn("ab", Derived.haversineM(col("la"), col("na"), col("lb"), col("nb")))
      .withColumn("ba", Derived.haversineM(col("lb"), col("nb"), col("la"), col("na")))
      .withColumn("bc", Derived.haversineM(col("lb"), col("nb"), col("lc"), col("nc")))
      .withColumn("ac", Derived.haversineM(col("la"), col("na"), col("lc"), col("nc")))
    df.collect().foreach { r =>
      val (ab, ba, bc, ac) = (r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9))
      assert(ab >= 0 && math.abs(ab - ba) < 1e-6)
      assert(ac <= ab + bc + 1e-6, "triangle inequality")
    }
  }

  test("session invariants: gaps within a race ≤ threshold, across > threshold") {
    val races = graft.marine.Races.split(
      Marine_wideTableCached, gapSeconds = 1800)
    val rows = races.orderBy("ts").collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val gap = b.getDouble(b.fieldIndex("ts")) - a.getDouble(a.fieldIndex("ts"))
        val sameRace = a.getLong(a.fieldIndex("race_id")) == b.getLong(b.fieldIndex("race_id"))
        if (sameRace) assert(gap <= 1800) else assert(gap > 1800)
      case _ =>
    }
  }

  private lazy val Marine_wideTableCached = {
    val path = NmeaFixture.write(java.nio.file.Files.createTempDirectory("nmea2").toString)
    graft.marine.Marine.wideTable(graft.marine.Marine.readLog(spark, path))
  }
}
