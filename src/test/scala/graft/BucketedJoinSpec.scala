package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #79 / §5: pre-bucketed tables make the fact-fact join
  * shuffle-free. Both sides are written bucketed by the join key into
  * the session catalog; Spark recognizes the co-partitioning and
  * plans a sort-merge join with ZERO exchanges — at 100 TB this is
  * the difference between re-shuffling the fact table on every join
  * and paying the layout cost once at write time. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed tables join with zero exchanges") {
    val t = Tables(spark, dir)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    t.orders.select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges <= 1,
        s"co-bucketed join must not shuffle either side (only the final " +
          s"aggregation may exchange); got $exchanges:\n${p.take(2000)}")
      // And the answer matches the plain (shuffling) join.
      val plain = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.except(plain).count() == 0 && plain.except(joined).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
