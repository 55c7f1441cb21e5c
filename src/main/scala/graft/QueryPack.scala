package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One pack per SURVEY.md §2 section. `queries` keys must match §2's
  * inventory names; every key present in `oracle` is hash-compared against
  * DuckDB by the driver, so each pair must obey the determinism contract
  * (SURVEY.md §7.5): total-order ORDER BY, rounded floats, no raw ns
  * timestamps, no maps / float arrays, aliases identical on both sides.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
