package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric":"total","value":…,"queries":…}.
  *
  * Each query is forced through the noop sink — a count() would let
  * Catalyst prune the projections of map-only queries (text_*, mm_*)
  * and time an empty scan instead of the operator.
  *
  * Steady-state timing: every query runs once untimed first (Janino
  * codegen compilation of the wide-aggregate queries costs seconds on
  * first execution — a per-process constant that a long-running
  * deployment amortizes to zero), then once timed. Set
  * SPARK_GRAFT_BENCH_COLD=1 to time first executions instead; the
  * JSON carries which mode ran.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables(spark, sfDir).region.write.format("noop").mode("overwrite").save()
    if (!cold) SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // failures re-surface in the timed pass
    }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val mode = if (cold) "cold" else "warm"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"mode":"$mode","sf":"$sfDir"}""")
    if (failed.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
