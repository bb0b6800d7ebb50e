package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: TPC-H-shaped scan/filter/aggregate/join/window
  * operators over the testdata star schema. Declarative DataFrame
  * plans throughout so Catalyst does pushdown, pruning, join
  * selection and AQE does runtime re-planning.
  *
  * Scale posture: dims (region/nation/supplier/part at this schema's
  * proportions) are broadcast explicitly; fact-fact joins shuffle on
  * their keys; aggregates are hash-aggregates with map-side partial
  * combine (Spark default).
  *
  * Oracle parity: money sums → integer cents, ratios → basis points,
  * timestamps → epoch seconds (see Tables.centsSql), deterministic
  * ORDER BY with full tie-breaks on both sides.
  */
object Relational {

  /** floor(x*100+0.5) as BIGINT — mirror of Tables.centsSql. */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5))
  def bp(c: Column): Column = floor(c * 10000 + lit(0.5))
  def epochS(c: Column): Column = unix_timestamp(c)

  // ─── q1_agg: scan → filter → hash aggregate (TPC-H Q1 shape) ───
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        cents(sum(col("l_quantity"))).as("sum_qty_cents"),
        cents(sum(col("l_extendedprice"))).as("sum_base_cents"),
        cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_cents"),
        cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
        cents(avg(col("l_quantity"))).as("avg_qty_cents"),
        cents(avg(col("l_extendedprice"))).as("avg_price_cents"),
        bp(avg(col("l_discount"))).as("avg_disc_bp"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Tables.centsSql("sum(l_quantity)")} AS sum_qty_cents,
       |  ${Tables.centsSql("sum(l_extendedprice)")} AS sum_base_cents,
       |  ${Tables.centsSql("sum(l_extendedprice*(1-l_discount))")} AS sum_disc_cents,
       |  ${Tables.centsSql("sum(l_extendedprice*(1-l_discount)*(1+l_tax))")} AS sum_charge_cents,
       |  ${Tables.centsSql("avg(l_quantity)")} AS avg_qty_cents,
       |  ${Tables.centsSql("avg(l_extendedprice)")} AS avg_price_cents,
       |  ${Tables.bpSql("avg(l_discount)")} AS avg_disc_bp,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ─── q2_topk: global order + limit (TakeOrderedAndProject) ───
  def q2Topk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(10)

  val q2Sql: String =
    s"""SELECT o_orderkey, ${Tables.centsSql("o_totalprice")} AS price_cents
       |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10""".stripMargin

  // ─── q3_join_agg: 3-way join + aggregate + top-k (TPC-H Q3) ───
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
    val ord = t.orders.filter(col("o_orderdate") < lit("1998-01-01"))
    val li = t.lineitem.filter(col("l_shipdate") > lit("1998-01-01"))
    // customer is the small side of customer⋈orders at any SF ratio
    // (1:10); broadcast it, shuffle-join the two fact tables on the
    // order key.
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .select(col("l_orderkey"), epochS(col("o_orderdate")).as("o_epoch"),
        col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(20)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_epoch,
       |  ${Tables.centsSql("sum(l_extendedprice*(1-l_discount))")} AS revenue_cents
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue_cents DESC, l_orderkey LIMIT 20""".stripMargin

  // ─── q4_broadcast_join: star join, broadcast dims (TPC-H Q5 shape) ───
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dims = broadcast(
      t.nation.join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    val ord = t.orders.filter(
      col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    t.lineitem
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(cents(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  val q4Sql: String =
    s"""SELECT n_name,
       |  ${Tables.centsSql("sum(l_extendedprice*(1-l_discount))")} AS revenue_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin

  // ─── q5_semi_join: EXISTS via left-semi ───
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val q5Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer WHERE EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ─── q6_anti_join: NOT EXISTS via left-anti ───
  def q6AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 350000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q6Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
      |ORDER BY c_custkey""".stripMargin

  // ─── q7_window_rank: top-3 per group via row_number ───
  def q7WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables(spark, dir).part
      // long, not int: DuckDB row_number() is BIGINT and the oracle
      // compare is type-sensitive
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"),
        cents(col("p_retailprice")).as("price_cents"))
      .orderBy(col("p_brand"), col("rn"))
  }

  val q7Sql: String =
    s"""SELECT p_brand, rn, p_partkey, ${Tables.centsSql("p_retailprice")} AS price_cents
       |FROM (SELECT *, row_number() OVER (
       |    PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
       |  FROM part) WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin

  // ─── q8_window_running: cumulative sum (integer cents → exact) ───
  def q8WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir).orders
      .withColumn("price_cents", cents(col("o_totalprice")))
      .withColumn("rn", row_number().over(w).cast("long")) // BIGINT parity
      .withColumn("run_cents",
        sum(col("price_cents")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("run_cents"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // CAST wraps the window sum: DuckDB promotes integer sum() to HUGEINT,
  // Spark stays LONG, and the driver's hash is type-sensitive.
  val q8Sql: String =
    s"""SELECT o_custkey, rn, o_orderkey, run_cents FROM (
       |  SELECT o_custkey, o_orderkey,
       |    row_number() OVER (
       |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
       |    CAST(sum(${Tables.centsSql("o_totalprice")}) OVER (
       |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
       |  FROM orders
       |) WHERE o_custkey < 200 ORDER BY o_custkey, rn""".stripMargin

  // ─── q9_distinct: distinct aggregates ───
  def q9Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q9Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ─── q10_having: aggregate + post-aggregate filter ───
  def q10Having(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        cents(sum(col("o_totalprice"))).as("spend_cents"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("n_orders").desc, col("o_custkey"))

  val q10Sql: String =
    s"""SELECT o_custkey, count(*) AS n_orders,
       |  ${Tables.centsSql("sum(o_totalprice)")} AS spend_cents
       |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
       |ORDER BY n_orders DESC, o_custkey""".stripMargin

  // ─── q11_scalar_subquery: compare to a global aggregate ───
  // The avg is quantized to integer cents BEFORE the comparison: a raw
  // double threshold makes row MEMBERSHIP depend on the engines'
  // float-summation order (a last-ulp difference flips boundary rows),
  // which the cents convention exists to prevent.
  def q11ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val avgPrice = t.part.agg(cents(avg(col("p_retailprice"))).as("gavg_cents"))
    t.part.join(broadcast(avgPrice))
      .filter(cents(col("p_retailprice")) > col("gavg_cents") + 500)
      .select(col("p_partkey"), cents(col("p_retailprice")).as("price_cents"))
      .orderBy(col("p_partkey"))
  }

  val q11Sql: String =
    s"""SELECT p_partkey, ${Tables.centsSql("p_retailprice")} AS price_cents
       |FROM part
       |WHERE ${Tables.centsSql("p_retailprice")} >
       |  (SELECT ${Tables.centsSql("avg(p_retailprice)")} FROM part) + 500
       |ORDER BY p_partkey""".stripMargin

  // ─── q12_case_agg: conditional aggregation (TPC-H Q12 shape) ───
  def q12CaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  val q12Sql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ─── q13_union: branch merge + distinct ───
  def q13Union(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.orders.filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("custkey"))
    val neg = t.customer.filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    big.union(neg).distinct().orderBy(col("custkey"))
  }

  val q13Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
      |UNION
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
      |ORDER BY custkey""".stripMargin

  // ─── q14_rollup: grouping sets ───
  def q14Rollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  val q14Sql: String =
    """SELECT coalesce(r_name, 'ALL') AS region_name,
      |  coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region_name, nation_name""".stripMargin

  // ─── q15_percentile: exact interpolated percentiles ───
  // NOT the built-in `percentile()` aggregate: that is an
  // ObjectHashAggregate buffering a value→count map of EVERY group
  // value in executor heap (no codegen, no spill-friendly layout) —
  // the slowest query in the bench and a straight OOM at 100 TB with
  // few groups. The scale shape is a distribution aggregate: groupBy
  // (group, value) counts — map-side combine shrinks this to the
  // distinct-value set, shuffled across ALL cores, not one reducer
  // per group — then a cumulative-count window over the (much
  // smaller) distinct values locates the two order statistics
  // bracketing each target rank, and a final tiny agg interpolates.
  // The interpolation replays DuckDB percentile_cont's formula in its
  // exact float evaluation order (lo + (hi-lo)*frac, pos = p*(n-1)) —
  // algebraically equal to Spark's own Percentile form
  // lo*(ceil-pos) + hi*(pos-floor), but the DuckDB order means the
  // two engines agree to the last ulp, not merely within the cents
  // quantization margin.
  def q15Percentile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    val c = d
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def pos(p: Double): Column = lit(p) * (col("n") - lit(1)).cast("double")
    def lowVal(p: Double): Column =
      min(when(col("cum") >= floor(pos(p)) + 1, col("l_extendedprice")))
    def highVal(p: Double): Column =
      min(when(col("cum") >= ceil(pos(p)) + 1, col("l_extendedprice")))
    def interp(posC: Column, lo: Column, hi: Column): Column =
      when(floor(posC) === ceil(posC), lo)
        .otherwise(lo + (hi - lo) * (posC - floor(posC)))
    c.groupBy(col("l_returnflag"))
      .agg(
        lowVal(0.5).as("lo50"), highVal(0.5).as("hi50"), max(pos(0.5)).as("pos50"),
        lowVal(0.9).as("lo90"), highVal(0.9).as("hi90"), max(pos(0.9)).as("pos90"),
        cents(min(col("l_extendedprice"))).as("min_cents"),
        cents(max(col("l_extendedprice"))).as("max_cents"))
      .select(col("l_returnflag"),
        cents(interp(col("pos50"), col("lo50"), col("hi50"))).as("p50_cents"),
        cents(interp(col("pos90"), col("lo90"), col("hi90"))).as("p90_cents"),
        col("min_cents"), col("max_cents"))
      .orderBy(col("l_returnflag"))
  }

  val q15Sql: String =
    s"""SELECT l_returnflag,
       |  ${Tables.centsSql("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)")} AS p50_cents,
       |  ${Tables.centsSql("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")} AS p90_cents,
       |  ${Tables.centsSql("min(l_extendedprice)")} AS min_cents,
       |  ${Tables.centsSql("max(l_extendedprice)")} AS max_cents
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ─── q16_asof_join: latest-before join, composed scalably as a
  // union + running window (no range join / no O(n·m) pair blowup;
  // one shuffle on the key, linear scan per key) ───
  def q16AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("event_type").isin("click", "purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        epochS(col("ts")).as("purchase_epoch"),
        epochS(col("last_click_ts")).as("click_epoch"))
      .orderBy(col("event_id"))
  }

  val q16Sql: String =
    """SELECT event_id, user_id, purchase_epoch, click_epoch FROM (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS purchase_epoch,
      |    CAST(floor(epoch(max(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))) AS BIGINT) AS click_epoch
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |) WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg,
    "q2_topk" -> q2Topk,
    "q3_join_agg" -> q3JoinAgg,
    "q4_broadcast_join" -> q4BroadcastJoin,
    "q5_semi_join" -> q5SemiJoin,
    "q6_anti_join" -> q6AntiJoin,
    "q7_window_rank" -> q7WindowRank,
    "q8_window_running" -> q8WindowRunning,
    "q9_distinct" -> q9Distinct,
    "q10_having" -> q10Having,
    "q11_scalar_subquery" -> q11ScalarSubquery,
    "q12_case_agg" -> q12CaseAgg,
    "q13_union" -> q13Union,
    "q14_rollup" -> q14Rollup,
    "q15_percentile" -> q15Percentile,
    "q16_asof_join" -> q16AsofJoin)

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_topk" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_broadcast_join" -> q4Sql,
    "q5_semi_join" -> q5Sql,
    "q6_anti_join" -> q6Sql,
    "q7_window_rank" -> q7Sql,
    "q8_window_running" -> q8Sql,
    "q9_distinct" -> q9Sql,
    "q10_having" -> q10Sql,
    "q11_scalar_subquery" -> q11Sql,
    "q12_case_agg" -> q12Sql,
    "q13_union" -> q13Sql,
    "q14_rollup" -> q14Sql,
    "q15_percentile" -> q15Sql,
    "q16_asof_join" -> q16Sql)
}
