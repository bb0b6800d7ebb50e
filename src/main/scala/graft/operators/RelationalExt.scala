package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational extensions beyond the TPC-H core: pivot, cube,
  * set operations (INTERSECT/EXCEPT), lead/lag navigation, ntile
  * bucketing, and correlated per-group comparison. Same conventions
  * as Relational: declarative plans, broadcast dims, integer-cents
  * oracle parity, deterministic ORDER BY.
  */
object RelationalExt {

  import Relational.{cents, epochS}

  // ─── q17_pivot: wide pivot on a known key domain ───
  // Pivot values are given explicitly: `.pivot(col)` without values
  // collects the distinct keys to the driver in a separate job — an
  // eager scan a 100 TB plan must not hide. With explicit values the
  // pivot lowers to one pass of conditional aggregation.
  def q17Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(cents(sum(col("o_totalprice"))))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cents"),
        coalesce(col("O"), lit(0L)).as("o_cents"),
        coalesce(col("P"), lit(0L)).as("p_cents"))
      .orderBy(col("o_orderpriority"))

  val q17Sql: String = {
    def branch(s: String) = Tables.centsSql(
      s"sum(CASE WHEN o_orderstatus = '$s' THEN o_totalprice END)")
    s"""SELECT o_orderpriority,
       |  coalesce(${branch("F")}, 0) AS f_cents,
       |  coalesce(${branch("O")}, 0) AS o_cents,
       |  coalesce(${branch("P")}, 0) AS p_cents
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  }

  // ─── q26_unpivot: wide → long (melt), inverse of q17 ───
  // Spark's native unpivot (a Generate of struct rows, no shuffle —
  // the long form streams out of the wide form map-side). Composing
  // it over q17Pivot round-trips pivot→unpivot, which is how the two
  // operators prove each other in both engines.
  def q26Unpivot(spark: SparkSession, dir: String): DataFrame =
    q17Pivot(spark, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("f_cents"), col("o_cents"), col("p_cents")),
        "status_col", "sum_cents")
      .orderBy(col("o_orderpriority"), col("status_col"))

  val q26Sql: String =
    s"""WITH p AS ($q17Sql)
       |SELECT o_orderpriority, 'f_cents' AS status_col, f_cents AS sum_cents FROM p
       |UNION ALL
       |SELECT o_orderpriority, 'o_cents', o_cents FROM p
       |UNION ALL
       |SELECT o_orderpriority, 'p_cents', p_cents FROM p
       |ORDER BY o_orderpriority, status_col""".stripMargin

  // ─── q18_cube: full cube over two dimensions ───
  // 'ALL' labels via coalesce: the source domains never contain the
  // literal, so the subtotal rows are unambiguous in both engines.
  def q18Cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        cents(sum(col("o_totalprice"))).as("spend_cents"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("spend_cents"))
      .orderBy(col("priority"), col("status"))

  val q18Sql: String =
    s"""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       |  coalesce(o_orderstatus, 'ALL') AS status,
       |  count(*) AS n_orders,
       |  ${Tables.centsSql("sum(o_totalprice)")} AS spend_cents
       |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
       |ORDER BY priority, status""".stripMargin

  // ─── q19_intersect: set intersection (distinct semantics) ───
  private def bigSpenders(t: Tables): DataFrame =
    t.orders.filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
  private def richBalances(t: Tables): DataFrame =
    t.customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))

  def q19Intersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    bigSpenders(t).intersect(richBalances(t)).orderBy(col("custkey"))
  }

  val q19Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
      |INTERSECT
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY custkey""".stripMargin

  // ─── q20_except: set difference (distinct semantics) ───
  def q20Except(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    bigSpenders(t).except(richBalances(t)).orderBy(col("custkey"))
  }

  val q20Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
      |EXCEPT
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY custkey""".stripMargin

  // ─── q21_lead_lag: per-key timeline navigation ───
  // The custkey filter sits below the window (same partition key), so
  // the window shuffle only carries the filtered slice.
  def q21LeadLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir).orders
      .filter(col("o_custkey") < 100)
      .withColumn("prev_epoch",
        coalesce(epochS(lag(col("o_orderdate"), 1).over(w)), lit(-1L)))
      .withColumn("next_epoch",
        coalesce(epochS(lead(col("o_orderdate"), 1).over(w)), lit(-1L)))
      .select(col("o_custkey"), col("o_orderkey"),
        epochS(col("o_orderdate")).as("order_epoch"),
        col("prev_epoch"), col("next_epoch"))
      .orderBy(col("o_custkey"), col("order_epoch"), col("o_orderkey"))
  }

  val q21Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
      |  coalesce(CAST(floor(epoch(lag(o_orderdate, 1) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) AS BIGINT), -1) AS prev_epoch,
      |  coalesce(CAST(floor(epoch(lead(o_orderdate, 1) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) AS BIGINT), -1) AS next_epoch
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, order_epoch, o_orderkey""".stripMargin

  // ─── q22_ntile: quartile bucketing + per-bucket stats ───
  def q22Ntile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables(spark, dir).part
      .withColumn("quartile", ntile(4).over(w).cast("long")) // BIGINT parity
      .groupBy(col("p_brand"), col("quartile"))
      .agg(count(lit(1)).as("n_parts"),
        cents(min(col("p_retailprice"))).as("lo_cents"),
        cents(max(col("p_retailprice"))).as("hi_cents"))
      .orderBy(col("p_brand"), col("quartile"))
  }

  val q22Sql: String =
    s"""SELECT p_brand, quartile, count(*) AS n_parts,
       |  ${Tables.centsSql("min(p_retailprice)")} AS lo_cents,
       |  ${Tables.centsSql("max(p_retailprice)")} AS hi_cents
       |FROM (SELECT p_brand, p_retailprice, ntile(4) OVER (
       |    PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS quartile
       |  FROM part)
       |GROUP BY p_brand, quartile ORDER BY p_brand, quartile""".stripMargin

  // ─── q23_correlated: rows vs their own group's aggregate ───
  // Spark side: window aggregate — ONE shuffle on the group key, no
  // per-row subquery re-execution; this is the scale-correct plan for
  // a correlated aggregate comparison. Oracle side: the literal
  // correlated subquery, proving the window formulation equivalent.
  // Comparison in integer math (cents*1000 vs cents*1010 — 1% above
  // the brand mean; retail prices cluster tightly around the mean, so
  // a 5% bar selects nothing at small SF) so membership can't flip on
  // a float ulp.
  def q23Correlated(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
    Tables(spark, dir).part
      .withColumn("brand_avg_cents", cents(avg(col("p_retailprice")).over(w)))
      .filter(cents(col("p_retailprice")) * 1000 > col("brand_avg_cents") * 1010)
      .select(col("p_partkey"), col("p_brand"),
        cents(col("p_retailprice")).as("price_cents"),
        col("brand_avg_cents"))
      .orderBy(col("p_partkey"))
  }

  val q23Sql: String =
    s"""SELECT p_partkey, p_brand,
       |  ${Tables.centsSql("p_retailprice")} AS price_cents,
       |  (SELECT ${Tables.centsSql("avg(p2.p_retailprice)")} FROM part p2
       |    WHERE p2.p_brand = p.p_brand) AS brand_avg_cents
       |FROM part p
       |WHERE ${Tables.centsSql("p_retailprice")} * 1000 >
       |  (SELECT ${Tables.centsSql("avg(p2.p_retailprice)")} FROM part p2
       |    WHERE p2.p_brand = p.p_brand) * 1010
       |ORDER BY p_partkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_pivot" -> q17Pivot,
    "q18_cube" -> q18Cube,
    "q19_intersect" -> q19Intersect,
    "q20_except" -> q20Except,
    "q21_lead_lag" -> q21LeadLag,
    "q22_ntile" -> q22Ntile,
    "q23_correlated" -> q23Correlated,
    "q26_unpivot" -> q26Unpivot)

  val oracle: Map[String, String] = Map(
    "q17_pivot" -> q17Sql,
    "q18_cube" -> q18Sql,
    "q19_intersect" -> q19Sql,
    "q20_except" -> q20Sql,
    "q21_lead_lag" -> q21Sql,
    "q22_ntile" -> q22Sql,
    "q23_correlated" -> q23Sql,
    "q26_unpivot" -> q26Sql)
}
