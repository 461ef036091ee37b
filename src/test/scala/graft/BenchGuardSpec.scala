package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact guards are pure functions over the artifact JSON —
  * pinned here so the no-clobber rule (BASELINE.md refused-artifacts
  * ledger) stays mechanical: a future run must divert exactly when the
  * ledger says one historically should have been diverted. */
class BenchGuardSpec extends AnyFunSuite {

  test("json field extractors read the artifact's flat shape") {
    val j = """{"value":149.3,"dedup_curve_sec":[18.4,32.5,62.3,128.5],""" +
      """"substring_smoke_sec":27.1,"code_fingerprint":"abc123","neg":-2.0}"""
    assert(Bench.jsonNum(j, "value").contains(149.3))
    assert(Bench.jsonNum(j, "substring_smoke_sec").contains(27.1))
    assert(Bench.jsonNum(j, "neg").contains(-2.0))
    assert(Bench.jsonNum(j, "missing").isEmpty)
    assert(Bench.jsonArr(j, "dedup_curve_sec") == Seq(18.4, 32.5, 62.3, 128.5))
    assert(Bench.jsonArr(j, "missing").isEmpty)
    assert(Bench.jsonStr(j, "code_fingerprint").contains("abc123"))
  }

  test("breachedSmokePin: the round-14 committed artifact holds every pin") {
    val committed = """{"dedup_curve_sec":[18.4,32.5,62.3,128.5],""" +
      """"substring_smoke_sec":27.1,"graph_curve_sec":[43.5,62.1,103.0]}"""
    assert(Bench.breachedSmokePin(committed).isEmpty)
  }

  test("breachedSmokePin names the first breached pin") {
    // substring wall past the BASELINE cap
    val sub = """{"substring_smoke_sec":311.0,"dedup_curve_sec":[20.0,30.0,60.0,120.0]}"""
    assert(Bench.breachedSmokePin(sub).exists(_.startsWith("substring_smoke_sec")))
    // 8x curve ratio past the cap (20 -> 240 is 12x > 11)
    val curve = """{"substring_smoke_sec":30.0,"dedup_curve_sec":[20.0,30.0,60.0,240.0]}"""
    assert(Bench.breachedSmokePin(curve).exists(_.startsWith("dedup_curve 8x")))
    // graph 4x ratio past the cap
    val graph = """{"substring_smoke_sec":30.0,"dedup_curve_sec":[20.0,30.0,60.0,120.0],""" +
      """"graph_curve_sec":[40.0,60.0,210.0]}"""
    assert(Bench.breachedSmokePin(graph).exists(_.startsWith("graph_curve 4x")))
  }

  test("breachedSmokePin: crash / not-reached sentinels are not breaches") {
    // -1 (crash), -2 (wrong count), -3 (not reached) are loud via
    // smoke_errors/partial; the pin comparator must not read them as
    // ratios or caps
    val j = """{"substring_smoke_sec":-1.0,"dedup_curve_sec":[-3.0,-3.0,-3.0,-3.0],""" +
      """"graph_curve_sec":[-1.0,-2.0,-3.0]}"""
    assert(Bench.breachedSmokePin(j).isEmpty)
  }

  test("smokesCrashed: errors map, negative sentinels, and the robokop exception") {
    // non-empty smoke_errors
    assert(Bench.smokesCrashed("""{"smoke_errors":{"merge":"boom"},"dedup_curve_sec":[1.0,2.0,3.0,4.0]}"""))
    // a -2.0 wrong-count sentinel leaves smoke_errors EMPTY — it must
    // still read as crashed (it breaches no pin and would otherwise
    // clobber a green artifact)
    assert(Bench.smokesCrashed("""{"smoke_errors":{},"dedup_curve_sec":[18.0,32.0,62.0,-2.0]}"""))
    assert(Bench.smokesCrashed("""{"smoke_errors":{},"dedup_curve_sec":[18.0,32.0,62.0,120.0],"substring_smoke_sec":-1.0}"""))
    // robokop_build_sec -1.0 is a legitimate fixtures-absent marker
    assert(!Bench.smokesCrashed("""{"smoke_errors":{},"robokop_build_sec":-1.0,"dedup_curve_sec":[18.0,32.0,62.0,120.0],"substring_smoke_sec":27.0,"winnow_smoke_sec":15.0,"merge_smoke_sec":32.0}"""))
  }

  test("crossCoreClobber: a different-core run never displaces a clean full artifact") {
    val disk32 = """{"value":150.0,"cpus":32,"bench_cpus":32,""" +
      """"contaminated":false,"partial":false}"""
    // the r15 failure mode: a clean 8-core driver run over a 32-core artifact
    assert(Bench.crossCoreClobber(disk32, 8))
    // same core count writes normally
    assert(!Bench.crossCoreClobber(disk32, 32))
    // a dirty or partial on-disk artifact never blocks (cleaner rules decide)
    val dirty = """{"value":150.0,"bench_cpus":32,"contaminated":true,"partial":false}"""
    assert(!Bench.crossCoreClobber(dirty, 8))
    // artifacts predating bench_cpus are indistinguishable — rule stays off
    val legacy = """{"value":150.0,"cpus":32,"contaminated":false,"partial":false}"""
    assert(!Bench.crossCoreClobber(legacy, 8))
  }

  test("codeFingerprint is stable within a run and tracks the source tree") {
    val a = Bench.codeFingerprint()
    assert(a != "unknown") // tests run from the repo root
    assert(a.length == 12 && a.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    assert(Bench.codeFingerprint() == a)
  }
}
