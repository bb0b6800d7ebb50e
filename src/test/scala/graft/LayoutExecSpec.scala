package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15: execute the layout plans against real parquet — the gap
  * between "plans the maintenance" and "does the maintenance".
  *
  * layout_zorder / layout_compact are oracle-checked PLANNERS: they
  * emit the file assignment a rewrite would produce. These tests
  * actually perform the rewrite (write the planned layout to disk as
  * one physical unit per planned file), then derive the file-level
  * min/max stats index from WHAT WAS WRITTEN and assert it equals the
  * oracled plan tables — so the oracled prune/fill numbers are proven
  * to describe real bytes, and the measurable claim behind z-ordering
  * (both band probes skip most files) holds on the physical layout,
  * not just the plan. */
class LayoutExecSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test
  private val dir = "/root/testdata/sf0.001"
  private val zBits = 8 // mirrors ScaleOps.zBits (private there)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("layout_zorder executed: written files reproduce the oracled prune table and skip both probes") {
    // sf0.01: ~15k orders over ~1k z-files puts enough rows in every
    // file that a linear layout genuinely cannot skip (at sf0.001 both
    // layouts skip almost everything because files hold 1-2 rows).
    val dir = "/root/testdata/sf0.01"
    val out = tmp("zorder")
    // 1. EXECUTE the plan: the planned file_id becomes a physical
    //    partition directory — one real parquet file per planned file.
    ScaleOps.layoutZorder(spark, dir)
      .write.partitionBy("file_id").mode("overwrite").parquet(out)

    // 2. Re-derive the per-file stats index from the WRITTEN layout
    //    (read back + re-join the clustering dims from orders), in the
    //    exact shape layout_prune — the oracled query — emits.
    val dims = Tables(spark, dir).orders.select(col("o_orderkey"),
      pmod(col("o_custkey"), lit(1L << zBits)).as("xd"),
      pmod(expr("unix_timestamp(o_orderdate) DIV 86400"),
        lit(1L << zBits)).as("yd"))
    val written = spark.read.parquet(out)
      .select(col("file_id").cast("long").as("file_id"), col("o_orderkey"))
      .join(dims, Seq("o_orderkey"))
    val (xLo, xHi, yLo, yHi) = (64L, 79L, 32L, 47L) // layout_prune's probes
    val idx = written.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xd")).as("min_xd"), max(col("xd")).as("max_xd"),
        min(col("yd")).as("min_yd"), max(col("yd")).as("max_yd"),
        sum(when(col("xd").between(xLo, xHi), 1L).otherwise(0L)).as("n_match_x"),
        sum(when(col("yd").between(yLo, yHi), 1L).otherwise(0L)).as("n_match_y"))
      .withColumn("scan_x", col("min_xd") <= xHi && col("max_xd") >= xLo)
      .withColumn("scan_y", col("min_yd") <= yHi && col("max_yd") >= yLo)

    val cols = Seq("file_id", "n_rows", "min_xd", "max_xd", "min_yd",
      "max_yd", "n_match_x", "n_match_y", "scan_x", "scan_y")
    val got = idx.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val plan = ScaleOps.layoutPrune(spark, dir)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(got == plan,
      "the stats index of the physically written z-layout must equal " +
        "the oracled layout_prune table")

    // 3. The z-layout's point: BOTH probes skip most files — and beat
    //    a linear (orderkey-sorted) layout with the same file count on
    //    the combined probe scan. The linear baseline IS the source
    //    table's native order, cut into equal-size files.
    val nFiles = idx.count()
    val scanZ = idx.agg(
      sum(when(col("scan_x"), 1L).otherwise(0L)).as("sx"),
      sum(when(col("scan_y"), 1L).otherwise(0L)).as("sy")).head
    val rows = dims.count()
    val linear = dims
      .withColumn("lin_file",
        expr(s"o_orderkey * $nFiles DIV ${rows * 4}")) // keys ~ 4x rows
      .groupBy(col("lin_file"))
      .agg(min(col("xd")).as("min_xd"), max(col("xd")).as("max_xd"),
        min(col("yd")).as("min_yd"), max(col("yd")).as("max_yd"))
      .agg(
        sum(when(col("min_xd") <= xHi && col("max_xd") >= xLo, 1L)
          .otherwise(0L)).as("sx"),
        sum(when(col("min_yd") <= yHi && col("max_yd") >= yLo, 1L)
          .otherwise(0L)).as("sy"),
        count(lit(1)).as("nf")).head
    val (zx, zy) = (scanZ.getAs[Long]("sx"), scanZ.getAs[Long]("sy"))
    val (lx, ly, lnf) = (linear.getAs[Long]("sx"), linear.getAs[Long]("sy"),
      linear.getAs[Long]("nf"))
    // Normalize to scan FRACTIONS (file counts differ slightly between
    // the layouts); the z-layout must scan a strictly smaller fraction
    // on the combined probes.
    val zFrac = (zx + zy).toDouble / (2 * nFiles)
    val lFrac = (lx + ly).toDouble / (2 * lnf)
    assert(zFrac < lFrac,
      f"z-order must beat the linear layout on combined probes: " +
        f"z $zFrac%.3f vs linear $lFrac%.3f")
    assert(zFrac < 0.8, f"z-layout should skip a real share of files, scans $zFrac%.3f")
  }

  test("layout_compact executed: bins land as physical files whose mass matches the plan") {
    val out = tmp("compact")
    val plan = ScaleOps.layoutCompact(spark, dir)
      .select(col("source"), col("lang"), col("bin"), col("bin_chars"))
    val nGroups = plan.count() // pre-compaction: one file per (source, lang)
    // EXECUTE: route every document to its planned bin and write one
    // physical partition per bin.
    Tables(spark, dir).documents
      .join(broadcast(plan.select(col("source"), col("lang"), col("bin"))),
        Seq("source", "lang"))
      .write.partitionBy("bin").mode("overwrite").parquet(out)
    val readBack = spark.read.parquet(out)
    // Row preservation and small-file reduction.
    assert(readBack.count() == Tables(spark, dir).documents.count())
    val binsWritten = readBack.select(col("bin")).distinct().count()
    assert(binsWritten < nGroups,
      s"compaction must reduce $nGroups (source,lang) files to fewer bins, got $binsWritten")
    // Each physical bin's char mass equals the plan's bin_chars.
    val got = readBack.groupBy(col("bin").cast("long").as("bin"))
      .agg(sum(col("n_chars")).as("mass"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = plan.groupBy(col("bin"))
      .agg(first(col("bin_chars")).as("bin_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      "physical bin masses must equal the oracled plan's bin_chars")
  }
}
