package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd readers over the driver-generated parquet tables
  * (TESTDATA.md). Plain parquet scans: Catalyst prunes columns and
  * pushes filters down to the scan, so operators never pre-select.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalized to the native microsecond TimestampType,
    * adapting to whatever physical type the driver-generated parquet
    * carries (the generator has changed it TWICE between rounds):
    *  - TIMESTAMP(NANOS): read as raw nanos
    *    (spark.sql.legacy.parquet.nanosAsLong, set by GraftSession);
    *  - TIMESTAMP(MICROS) without tz: arrives as TIMESTAMP_NTZ; cast
    *    to TimestampType (identity under the session's UTC zone);
    *  - TIMESTAMP(MICROS) with tz: already TimestampType, no-op.
    *
    * A raw INT64 column is disambiguated by MAGNITUDE, not assumed to
    * be nanos (the r11 ADVICE hazard: an unannotated-micros file
    * silently divided by 1000): epoch seconds (~2·10⁹), millis
    * (~2·10¹²), micros (~2·10¹⁵) and nanos (~2·10¹⁸) occupy disjoint
    * decades for any instant between 1973 and 5138, so one codegen'd
    * per-row comparison picks the right unit for every physical
    * encoding the generator could emit — integer DIV throughout, no
    * double round-off. (TablesTsSpec pins all four units + both
    * timestamp physical types.) */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr(
        """timestamp_micros(CASE
          |  WHEN ts >= 100000000000000000 THEN ts DIV 1000
          |  WHEN ts >= 100000000000000    THEN ts
          |  WHEN ts >= 100000000000       THEN ts * 1000
          |  ELSE                               ts * 1000000
          |END)""".stripMargin))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Money/ratio → integer fixed-point (x100 "cents"): dodges
    * float-summation-order divergence between engines in the oracle
    * compare while keeping 2dp resolution. */
  def centsSql(x: String): String = s"CAST(floor(($x) * 100 + 0.5) AS BIGINT)"
  /** Ratio → basis points (x10000). */
  def bpSql(x: String): String = s"CAST(floor(($x) * 10000 + 0.5) AS BIGINT)"

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** SQL-first entry point: register every table as a temp view so
    * `spark.sql("SELECT … FROM lineitem JOIN orders …")` works
    * directly — the same schema'd readers (events keeps its
    * nanos→micros conversion), so SQL and DataFrame callers see
    * identical data. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    Seq("region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }
}
