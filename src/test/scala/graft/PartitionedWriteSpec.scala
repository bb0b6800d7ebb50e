package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2 #81: incremental partitioned output. Dynamic partition
  * overwrite replaces ONLY the partitions present in the incoming
  * batch — the write-side contract that makes daily backfills safe at
  * 100 TB: re-running one day's pipeline must not truncate the other
  * 364 partitions (static overwrite mode would). */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  test("dynamic partition overwrite touches only the incoming partitions") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-dpo").toString
    val old = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // Day 1 + day 2 land.
      Seq((1L, "2026-01-01", 10L), (2L, "2026-01-02", 20L))
        .toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(out)
      // Re-run of day 2 only (corrected value): day 1 must survive.
      Seq((3L, "2026-01-02", 21L))
        .toDF("id", "day", "v")
        .write.mode("overwrite").partitionBy("day").parquet(out)
      val rows = spark.read.parquet(out)
        .select($"day", $"id", $"v").as[(String, Long, Long)]
        .collect().toSet
      assert(rows == Set(("2026-01-01", 1L, 10L), ("2026-01-02", 3L, 21L)),
        s"day 1 untouched, day 2 replaced: $rows")
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("dynamic partition pruning reaches the partitioned fact scan") {
    // The read-side twin of the overwrite contract: a fact table
    // partitioned on the join key scans ONLY the partitions the
    // filtered dimension selects — at 100 TB the difference between
    // reading one day and reading the year. The pruning predicate is
    // injected at RUNTIME from the dim side (dynamicpruning
    // subquery), which static predicate pushdown cannot express.
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables(spark, "/root/testdata/sf0.001").orders
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    // At test scale the size-based benefit estimate vetoes the (free,
    // broadcast-reusing) pruning subquery; disable the stats heuristic
    // so the plan shape is the one a real partitioned fact would get.
    val statsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.getOption(statsKey)
    spark.conf.set(statsKey, "false")
    try {
      val fact = spark.read.parquet(out)
      // The dim must be a real scan with the filter ABOVE it: a local
      // Seq would constant-fold filter+relation into one
      // LocalTableScan and leave no selective predicate for the
      // pruning rule to find.
      val dimPath = java.nio.file.Files.createTempDirectory("graft-dppdim").toString
      Seq(("F", "filled"), ("O", "open"), ("P", "pending"))
        .toDF("status", "label")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
        .filter($"label" === "filled") // selects exactly one partition
      val joined = fact.join(dim, $"o_orderstatus" === $"status")
        .groupBy($"label").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a runtime pruning subquery on the fact scan:\n${plan.take(1500)}")
      // And it computes the right answer (only status F rows counted).
      val expected = Tables(spark, "/root/testdata/sf0.001").orders
        .filter($"o_orderstatus" === "F").count()
      assert(joined.collect().map(r => r.getLong(1)).sum == expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(statsKey, v)
        case None => spark.conf.unset(statsKey)
      }
    }
  }
}
