package graft

import graft.operators.AggQueries

class AggQueriesSpec extends SparkSpec {

  test("agg_groupby returns one row per (returnflag, linestatus), sorted") {
    val rows = AggQueries.queries("agg_groupby")(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(keys.sameElements(keys.sorted))
    // count_order must sum to the filtered row count
    val total = rows.map(_.getLong(7)).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02")
      .count()
    assert(total == expected)
  }

  test("agg_global is a single row with consistent min<=avg<=max") {
    val r = AggQueries.queries("agg_global")(spark, sf).collect().head
    assert(r.getLong(0) > 0)
    val (mn, av, mx) = (r.getDouble(3), r.getDouble(2), r.getDouble(4))
    assert(mn <= av && av <= mx)
  }

  test("agg_distinct counts are bounded by group row counts") {
    AggQueries.queries("agg_distinct")(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(3) && r.getLong(2) <= r.getLong(3))
    }
  }

  test("agg_having only keeps groups meeting the threshold") {
    AggQueries.queries("agg_having")(spark, sf).collect()
      .foreach(r => assert(r.getLong(1) >= 12))
  }

  test("every queries key has matching oracle column aliases declared") {
    // All AggQueries keys are oracle-checked
    assert(AggQueries.queries.keySet == AggQueries.oracle.keySet)
  }

  test("entry() smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
