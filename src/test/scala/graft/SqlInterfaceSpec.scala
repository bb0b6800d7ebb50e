package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #83: the SQL-first surface. Tables.registerViews makes
  * every table a temp view, so users can drive the engine with
  * `spark.sql(...)` — including the custom graft_dot expression —
  * and get the same results as the DataFrame builders. */
class SqlInterfaceSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame operator") {
    Tables.registerViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val viaDf = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("custom graft_dot expression is callable from SQL over the views") {
    Tables.registerViews(spark, dir)
    val rows = spark.sql(
      """SELECT a.vec_id,
        |  graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |            CAST(b.embedding AS ARRAY<DOUBLE>)) AS dp
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id < 3 ORDER BY a.vec_id""".stripMargin).collect()
    assert(rows.length == 3)
    // Self-dot of vec 0 must be its squared norm (> 0).
    assert(rows(0).getDouble(1) > 0.0)
  }

  test("events view carries the micro-second timestamp conversion") {
    Tables.registerViews(spark, dir)
    val sqlMin = spark.sql("SELECT CAST(min(ts) AS STRING) FROM events").head.getString(0)
    val dfMin = Tables(spark, dir).events
      .agg(min(col("ts")).cast("string")).head.getString(0)
    assert(sqlMin == dfMin)
  }
}
