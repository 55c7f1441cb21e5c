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

  test("agg_regression matches a driver-side least-squares recompute") {
    val rows = AggQueries.queries("agg_regression")(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val g = raw(r.getString(0))
      val (ys, xs) = (g.map(_.getDouble(1)), g.map(_.getDouble(2)))
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val slope = sxy / sxx
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-3,
        s"slope ${r.getAs[Double]("slope")} vs recomputed $slope")
      assert(math.abs(r.getAs[Double]("intercept") - (my - slope * mx)) < 1e-1)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(r.getAs[Long]("n") == g.length.toLong)
    }
  }

  test("every queries key has matching oracle column aliases declared") {
    // All AggQueries keys are oracle-checked
    assert(AggQueries.queries.keySet == AggQueries.oracle.keySet)
  }

  test("entry() smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
