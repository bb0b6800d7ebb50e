package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #23's approximate half: approx_percentile (the sketch a
  * 100 TB deployment actually runs — fixed-size state, map-side
  * combinable) stays within tolerance of the exact interpolated
  * percentile the DuckDB oracle pins. */
class PercentileSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("approx_percentile tracks exact percentile within 2%") {
    val rows = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.9)").as("exact_p90"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("approx_p90"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; (e, a) <- Seq((r.getDouble(1), r.getDouble(2)),
        (r.getDouble(3), r.getDouble(4)))) {
      assert(math.abs(a - e) / e <= 0.02,
        s"approx $a vs exact $e for ${r.getString(0)}")
    }
  }

  test("approx_count_distinct tracks exact within 5%") {
    val r = Tables(spark, dir).lineitem
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .head()
    val (e, a) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
  }
}
