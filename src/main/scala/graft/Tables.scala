package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd readers over the driver-generated parquet tables
  * (TESTDATA.md). Plain parquet scans: Catalyst prunes columns and
  * pushes filters down to the scan, so operators never pre-select.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), read as raw nanos
    * (spark.sql.legacy.parquet.nanosAsLong — set by GraftSession at
    * construction) and floor-converted to the native microsecond
    * TimestampType (integer DIV, no double round-off). */
  def events: DataFrame =
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))

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
}
