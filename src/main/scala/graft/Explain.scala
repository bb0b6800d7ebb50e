package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for named queries to files.
  *
  *   runMain graft.Explain <sfDir> <outDir> <suffix> <k1,k2,…|all>
  *
  * Writes <outDir>/<key>_<suffix>.txt per key. The optimization rounds
  * commit these as plans/rNN/<key>_before.txt / _after.txt so plan
  * claims (Exchange counts, join strategies, PushedFilters) are
  * auditable without running Spark. Note: queries that materialize
  * eagerly while BUILDING their frame (the iterative graph ops, which
  * return a localCheckpoint) show the checkpoint scan here; their
  * interesting plan is the per-round step, documented separately where
  * a claim depends on it.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val keys: Seq[String] =
      if (args.length < 4 || args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      SparkEntry.queries.get(k) match {
        case None => System.err.println(s"[explain] unknown key $k")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/${k}_$suffix.txt"), txt)
            System.err.println(s"[explain] $k -> $outDir/${k}_$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $k failed: ${e.getMessage}")
          }
      }
    }
    Families.invalidateFixtures()
    spark.stop()
  }
}
