package graft

import graft.telemetry.Telemetry
import graft.telemetry.Telemetry._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The structured-telemetry stack: backend selection parity with the
  * reference's runtime.exs truth table, level routing, metadata
  * scoping, HEC envelope shape, Sentry-style error capture with
  * breadcrumbs, and the executor-side put_run wiring. */
class TelemetrySpec extends AnyFunSuite with BeforeAndAfterEach {

  override def afterEach(): Unit =
    Telemetry.install(Seq(new ConsoleBackend()))

  private def names(bs: Seq[LogBackend]): Seq[String] =
    bs.map(_.getClass.getSimpleName)

  // --- backend truth table (runtime.exs:42-49) -----------------------------

  test("configure: empty env -> console only, any mode") {
    assert(names(Telemetry.configure(Map.empty, mode = "prod")) ===
      Seq("ConsoleBackend"))
    assert(names(Telemetry.configure(Map.empty, mode = "dev")) ===
      Seq("ConsoleBackend"))
  }

  test("configure: splunk token only installs in prod mode") {
    val env = Map("GRAFT_SPLUNK_TOKEN" -> "tok",
      "GRAFT_SPLUNK_SPOOL" -> "/tmp/graft-telemetry-spec/spool.jsonl")
    assert(names(Telemetry.configure(env, mode = "prod")) ===
      Seq("ConsoleBackend", "SplunkLikeBackend"))
    assert(names(Telemetry.configure(env, mode = "dev")) ===
      Seq("ConsoleBackend"))
  }

  test("configure: sentry needs BOTH dsn and env, in any mode") {
    val both = Map("GRAFT_SENTRY_DSN" -> "d", "GRAFT_SENTRY_ENV" -> "e")
    assert(names(Telemetry.configure(both, mode = "dev")) ===
      Seq("ConsoleBackend", "SentryLikeBackend"))
    assert(names(Telemetry.configure(
      Map("GRAFT_SENTRY_DSN" -> "d"), mode = "prod")) === Seq("ConsoleBackend"))
    assert(names(Telemetry.configure(
      Map("GRAFT_SENTRY_ENV" -> "e"), mode = "prod")) === Seq("ConsoleBackend"))
  }

  test("configure: full prod env installs all three") {
    val env = Map("GRAFT_SPLUNK_TOKEN" -> "tok",
      "GRAFT_SPLUNK_SPOOL" -> "/tmp/graft-telemetry-spec/spool2.jsonl",
      "GRAFT_SENTRY_DSN" -> "d", "GRAFT_SENTRY_ENV" -> "e")
    assert(names(Telemetry.configure(env, mode = "prod")) ===
      Seq("ConsoleBackend", "SentryLikeBackend", "SplunkLikeBackend"))
  }

  // --- level routing + HEC envelope ----------------------------------------

  test("splunk backend: info-and-above only, HEC envelope with auth header first") {
    val lines = ArrayBuffer[String]()
    Telemetry.install(Seq(new SplunkLikeBackend("s3cret", lines += _)))
    Telemetry.debug("below threshold")
    Telemetry.info("hello hec", "conn" -> "c1")
    Telemetry.error("boom")
    assert(lines.head === """{"authorization":"Splunk s3cret"}""")
    assert(lines.size === 3) // auth + info + error, debug filtered
    assert(lines(1).contains(""""event":"hello hec""""))
    assert(lines(1).contains(""""conn":"c1""""))
    assert(lines(1).contains(""""level":"info""""))
    assert(lines(2).contains(""""level":"error""""))
    // envelope is one JSON object per line with a numeric time field
    assert(lines(1).startsWith("""{"time":"""))
  }

  test("splunk backend: escapes quotes, backslashes and newlines") {
    val lines = ArrayBuffer[String]()
    Telemetry.install(Seq(new SplunkLikeBackend("t", lines += _)))
    Telemetry.info("say \"hi\"\nback\\slash")
    assert(lines(1).contains("""say \"hi\"\nback\\slash"""))
  }

  // --- metadata scoping (proxy.ex:75,152,207) -------------------------------

  test("withMetadata nests and restores; tags attach to events inside") {
    val lines = ArrayBuffer[String]()
    Telemetry.install(Seq(new ConsoleBackend(lines += _)))
    Telemetry.withMetadata("socket" -> "s1") {
      Telemetry.info("outer")
      Telemetry.withMetadata("request_id" -> "42") {
        Telemetry.info("inner")
      }
      Telemetry.info("outer again")
    }
    Telemetry.info("outside")
    assert(lines(0).contains("socket=s1") && !lines(0).contains("request_id"))
    assert(lines(1).contains("socket=s1") && lines(1).contains("request_id=42"))
    assert(lines(2).contains("socket=s1") && !lines(2).contains("request_id"))
    assert(!lines(3).contains("socket="))
  }

  test("withRequestId issues fresh positive ids per scope") {
    val lines = ArrayBuffer[String]()
    Telemetry.install(Seq(new ConsoleBackend(lines += _)))
    Telemetry.withRequestId { Telemetry.info("a") }
    Telemetry.withRequestId { Telemetry.info("b") }
    val ids = lines.map(_.split("request_id=")(1).split(" ")(0).toLong)
    assert(ids.forall(_ > 0) && ids(0) < ids(1))
  }

  // --- sentry twin ----------------------------------------------------------

  test("sentry backend: captures errors only, with env tag and breadcrumbs") {
    val captured = ArrayBuffer[CapturedError]()
    Telemetry.install(Seq(new SentryLikeBackend("staging", captured += _)))
    Telemetry.info("crumb 1")
    Telemetry.warn("crumb 2")
    assert(captured.isEmpty) // sub-error events never capture
    Telemetry.error("exploded", "conn" -> "c9")
    assert(captured.size === 1)
    val c = captured.head
    assert(c.environment === "staging")
    assert(c.event.message === "exploded")
    assert(c.event.metadata("conn") === "c9")
    assert(c.breadcrumbs.map(_.message) === Seq("crumb 1", "crumb 2"))
  }

  test("sentry breadcrumb ring is bounded, keeps most recent") {
    val captured = ArrayBuffer[CapturedError]()
    Telemetry.install(Seq(
      new SentryLikeBackend("e", captured += _, breadcrumbLimit = 3)))
    (1 to 10).foreach(i => Telemetry.info(s"c$i"))
    Telemetry.error("x")
    assert(captured.head.breadcrumbs.map(_.message) === Seq("c8", "c9", "c10"))
  }

  // --- file spool -----------------------------------------------------------

  test("file spool appends one JSON line per event") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spool").toString
    val path = s"$dir/spool.jsonl"
    Telemetry.install(Seq(new SplunkLikeBackend("t", new FileSpool(path))))
    Telemetry.info("one")
    Telemetry.info("two")
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.size === 3 && lines.tail.forall(_.startsWith("""{"time":""")))
  }
}
