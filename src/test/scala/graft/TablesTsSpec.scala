package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins Tables.events' timestamp-type adaptation. The driver's data
  * generator has changed events.ts' physical parquet type twice
  * between rounds (TIMESTAMP µs-with-tz → TIMESTAMP_NTZ → raw INT64
  * nanos), and each change silently broke ~59 queries for half a
  * round. This spec writes a tiny events.parquet in every physical
  * shape the generator could emit and asserts the reader normalizes
  * each to the same microsecond TimestampType instant — so the next
  * generator change fails HERE, named, instead of in 59 oracles.
  */
class TablesTsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.test

  // 2026-01-02T03:04:05.123456Z
  private val micros = 1767323045123456L

  /** Write a one-row events.parquet holding `ts` built by `mk`, read
    * it back through Tables.events, return (type name, micros). */
  private def roundTrip(mk: org.apache.spark.sql.Column): (String, Long) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ts").toString
    Seq(micros).toDF("us")
      .select(lit(1L).as("event_id"), mk.as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    val got = ev.select(unix_micros(col("ts"))).as[Long].head()
    (ev.schema("ts").dataType.simpleString, got)
  }

  test("raw INT64 nanos normalizes exactly (integer DIV, no round-off)") {
    assert(roundTrip(lit(micros * 1000L))._2 == micros)
  }

  test("raw INT64 micros is NOT divided by 1000 (the r11 ADVICE hazard)") {
    assert(roundTrip(lit(micros))._2 == micros)
  }

  test("raw INT64 millis upscales") {
    assert(roundTrip(lit(micros / 1000L))._2 == (micros / 1000L) * 1000L)
  }

  test("raw INT64 epoch seconds upscales") {
    assert(roundTrip(lit(micros / 1000000L))._2 == (micros / 1000000L) * 1000000L)
  }

  test("TIMESTAMP_NTZ micros casts losslessly under the UTC session zone") {
    assert(roundTrip(timestamp_micros(lit(micros)).cast(TimestampNTZType))._2 == micros)
  }

  test("native TimestampType passes through untouched") {
    assert(roundTrip(timestamp_micros(lit(micros)))._2 == micros)
  }
}
