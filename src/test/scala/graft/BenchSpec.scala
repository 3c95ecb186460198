package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench load-guard predicate (BASELINE.md's "never trust a
  * contended window" rule). The round-6 driver artifact passed the old
  * `load_before > cpus/4` (= 8) guard at load 2.99 yet measured 78.6 s
  * where idle same-HEAD runs give 59.9-61.7 s — these cases make that
  * exact miss impossible to repeat.
  */
class BenchSpec extends AnyFunSuite {

  test("idle run within the committed record is clean") {
    assert(!Bench.isContended(1.2, 60.5, Some(59.9)))
  }

  test("load_before above 2 flags even when the old cpus/4 guard would not") {
    // the round-6 miss: load 2.99 < 8 passed; must flag now
    assert(Bench.isContended(2.99, 78.6, Some(59.9)))
    assert(Bench.isContended(2.99, 78.6, None))
  }

  test("total >15% over the committed record flags regardless of loadavg") {
    assert(Bench.isContended(0.5, 59.9 * 1.16, Some(59.9)))
    assert(!Bench.isContended(0.5, 59.9 * 1.14, Some(59.9)))
  }

  test("subset runs (no committed record) rely on loadavg alone") {
    assert(!Bench.isContended(1.9, 500.0, None))
    assert(Bench.isContended(2.1, 1.0, None))
  }

  test("a slow-mode run flags on the per-query median ratio at idle loadavg") {
    // the round-9 trap: hypervisor-level slowness invisible to loadavg
    // (q85 probes 7.3-14.7 s vs its 3.45 s record at loadavg 0.09) on a
    // GROWN suite, where the size-mismatched total clause cannot compare —
    // without the median clause such a run would certify as a clean record
    assert(Bench.isContended(0.09, 87.0, None, Some(1.55)))
    // the observed mild-slow-mode median (1.2998, a 92.1 s run) must flag
    assert(Bench.isContended(0.09, 92.1, None, Some(1.2998)))
    assert(!Bench.isContended(0.09, 87.0, None, Some(1.1)))
    assert(!Bench.isContended(0.09, 87.0, None, None))
  }

  test("medianRatio compares shared queries above the noise floor") {
    val record = (1 to 30).map(i => s"q$i" -> 1.0).toMap + ("q31" -> 0.05)
    // uniform 2x inflation over 30 shared queries; the sub-floor q31 and
    // the record-less q99 are ignored
    val run = (1 to 30).map(i => s"q$i" -> 2.0) :+ ("q31" -> 50.0) :+ ("q99" -> 9.0)
    assert(Bench.medianRatio(run, record).contains(2.0))
    // under 20 shared queries: no anchor (a subset must not flag on a
    // handful of ratios)
    val few = (1 to 10).map(i => s"q$i" -> 2.0)
    assert(Bench.medianRatio(few, record).isEmpty)
  }

  test("recordQueries refuses a contaminated or missing record") {
    assert(Bench.recordQueries("/nonexistent/path.json").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bench-rec")
    val contaminated = dir.resolve("c.json")
    java.nio.file.Files.writeString(contaminated,
      """{"queries":{"q01_x":1.5},"contended":true}""")
    assert(Bench.recordQueries(contaminated.toString).isEmpty)
    val clean = dir.resolve("ok.json")
    java.nio.file.Files.writeString(clean,
      """{"queries":{"q01_x":1.5,"q02_y":0.25},"contended":false,""" +
        """"rerun_worst":{"name":"q01_x","first":1.5,"second":1.2}}""")
    assert(Bench.recordQueries(clean.toString) ==
      Map("q01_x" -> 1.5, "q02_y" -> 0.25))
  }

  test("the committed record carries its suite size") {
    // a grown suite legitimately costs more than the old record; comparing
    // across sizes would mislabel every clean run contended and the new
    // suite could never certify — main only passes the record through
    // when the run's query count matches the record's
    Bench.CommittedTotalSec.foreach { case (sf, (n, sec)) =>
      assert(n > 0 && sec > 0, s"$sf record malformed")
    }
  }

  test("a throwing query surfaces in the errors fragment") {
    assert(Bench.errorsJson(Seq("q55_hll" -> "AnalysisException")) ==
      ""","errors":{"q55_hll":"AnalysisException"}""")
    assert(Bench.errorsJson(Seq("a" -> "X", "b" -> "Y")) ==
      ""","errors":{"a":"X","b":"Y"}""")
  }

  test("all-green runs emit no errors fragment (artifact shape unchanged)") {
    assert(Bench.errorsJson(Nil) == "")
  }

  test("a contended run routes away from the certified record file") {
    // the round-8 incident: the driver's contended run clobbered the
    // certified BENCH_FULL.json; only a restore commit saved the record
    assert(Bench.artifactPath("BENCH_FULL.json", contended = true) ==
      "BENCH_FULL.contended.json")
    assert(Bench.artifactPath("/tmp/out/bench.json", contended = true) ==
      "/tmp/out/bench.contended.json")
    assert(Bench.artifactPath("bench_raw", contended = true) ==
      "bench_raw.contended")
  }

  test("a clean full-suite run writes the certified record path unchanged") {
    assert(Bench.artifactPath("BENCH_FULL.json", contended = false) ==
      "BENCH_FULL.json")
  }

  test("a subset run routes away from the certified record file") {
    // subset totals are not comparable to the full-suite record; they
    // must never replace it
    assert(Bench.artifactPath("BENCH_FULL.json", contended = false, subset = true) ==
      "BENCH_FULL.subset.json")
    // contended beats subset in the tag (the stronger warning wins)
    assert(Bench.artifactPath("BENCH_FULL.json", contended = true, subset = true) ==
      "BENCH_FULL.contended.json")
  }
}
