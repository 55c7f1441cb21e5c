package graft.marine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived sailing channels (SURVEY.md §2.10): true wind from apparent,
  * VMG, great-circle distance. Pure trig column expressions — public
  * physics, no UDFs, fully codegen'd.
  */
object Derived {

  /** True wind speed from apparent wind + boat speed (law of cosines):
    * tws² = aws² + bs² − 2·aws·bs·cos(awa).  awa in degrees, 0 = bow.
    */
  def tws(aws: Column, awa: Column, bs: Column): Column =
    sqrt(aws * aws + bs * bs - lit(2.0) * aws * bs * cos(radians(awa)))

  /** True wind angle (signed like AWA: starboard positive):
    * twa = atan2(aws·sin(awa), aws·cos(awa) − bs).
    */
  def twa(aws: Column, awa: Column, bs: Column): Column =
    degrees(atan2(aws * sin(radians(awa)), aws * cos(radians(awa)) - bs))

  /** True wind direction: heading + TWA, normalised to [0, 360). */
  def twd(hdg: Column, twaDeg: Column): Column =
    pmod(hdg + twaDeg, lit(360.0))

  /** Apparent wind back from true — inverse used by the property tests.
    * aws² = tws² + bs² + 2·tws·bs·cos(twa).
    */
  def awsFromTrue(twsC: Column, twaC: Column, bs: Column): Column =
    sqrt(twsC * twsC + bs * bs + lit(2.0) * twsC * bs * cos(radians(twaC)))

  def awaFromTrue(twsC: Column, twaC: Column, bs: Column): Column =
    degrees(atan2(twsC * sin(radians(twaC)), twsC * cos(radians(twaC)) + bs))

  /** Velocity made good toward the wind (upwind positive). */
  def vmg(sog: Column, twaDeg: Column): Column =
    sog * cos(radians(twaDeg))

  /** Haversine great-circle distance in meters (R = 6371008.8 m). */
  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371008.8) * asin(sqrt(a))
  }

  /** Knots → meters/second. */
  def knToMs(kn: Column): Column = kn * lit(0.514444)
}
