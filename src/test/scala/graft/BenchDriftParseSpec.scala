package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.parseDriftReference]]'s regexes to the artifact format
  * renderFull actually writes (r15 advice): the host-drift telemetry is
  * -1-on-mismatch by design, so a silent format drift would disable the
  * drift flag with no visible failure anywhere — this spec makes the
  * committed artifact itself the executable format contract.
  */
class BenchDriftParseSpec extends AnyFunSuite {

  test("the committed BENCH_OUT.json parses to a positive same-SF reference") {
    val ref = Paths.get("BENCH_OUT.json")
    assume(Files.exists(ref), "no committed bench artifact in the working dir")
    val txt = Files.readString(ref)
    val sf = """"sf":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
    assert(sf.nonEmpty, "artifact must carry its sf tag")
    val med = Bench.parseDriftReference(txt, sf.get)
    assert(med > 0,
      "the committed artifact (written by renderFull) must yield a drift " +
        "reference — if this fails, renderFull's format drifted out from " +
        "under the parse regexes")
  }

  test("a different-SF artifact yields no reference (cross-SF medians are not host signals)") {
    val txt = """{"metric":"total","canary_median":0.281,"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseDriftReference(txt, "/root/testdata/sf0.01") == -1.0)
    assert(Bench.parseDriftReference(txt, "/root/testdata/sf0.1") == 0.281)
  }

  test("a pre-field artifact falls back to the median of the stored canary series") {
    // the first canary sample is the cold one renderFull's own median drops
    val txt =
      """{"metric":"total","canary":[9.0,0.30,0.10,0.20],"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseDriftReference(txt, "/root/testdata/sf0.1") == 0.20)
  }

  test("garbage and field-less artifacts yield -1, never a throw") {
    assert(Bench.parseDriftReference("", "/root/testdata/sf0.1") == -1.0)
    assert(Bench.parseDriftReference("""{"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1") == -1.0)
    assert(Bench.parseDriftReference(
      """{"canary_median":abc,"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1") == -1.0)
  }
}
