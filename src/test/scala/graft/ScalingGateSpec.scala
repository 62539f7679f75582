package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sweep-flag build gate: any query the last bench sweep measured as
  * superlinear (exponent > [[ScalingGate.Threshold]], sf0.01→sf0.1)
  * fails `sbt test` here until its plan is fixed or SCALE.md carries an
  * explicit `SUPERLINEAR-OK: qNN — reason` waiver. See [[ScalingGate]].
  */
class ScalingGateSpec extends AnyFunSuite {
  test("every sweep-flagged superlinear query is fixed or SCALE.md-waived") {
    val bad = ScalingGate.unexplained()
    assert(bad.isEmpty,
      s"superlinear plans shipped without a SCALE.md waiver: ${bad.mkString(", ")} — " +
        "de-quadratic the plan (candidate-then-verify, grid cells, artifact reuse) " +
        "or document the bounding cap with a SUPERLINEAR-OK line")
  }

  test("waiver parser reads SUPERLINEAR-OK lines and bench superlinear blocks") {
    val dir = java.nio.file.Files.createTempDirectory("gate")
    val scale = dir.resolve("SCALE.md")
    java.nio.file.Files.write(scale,
      ("## caps\n\nSUPERLINEAR-OK: q999 — output itself is quadratic, capped at 10k pairs\n" +
        "not a waiver: q123\n").getBytes("UTF-8"))
    assert(ScalingGate.waivers(scale) === Set("q999"))
    val bench = dir.resolve("bench.json")
    java.nio.file.Files.write(bench,
      """{"queries":{"q1":0.5},"superlinear":["q999","q222"]}""".getBytes("UTF-8"))
    assert(ScalingGate.superlinear(bench) === Seq("q999", "q222"))
    assert(ScalingGate.waivers(dir.resolve("missing.md")) === Set.empty)
    assert(ScalingGate.superlinear(dir.resolve("missing.json")) === Seq.empty)
  }

  test("the hi-pair list is parsed independently and gated alongside the mid pair (round 13)") {
    val dir = java.nio.file.Files.createTempDirectory("gatehi")
    val bench = dir.resolve("bench.json")
    // a hi flag must not leak into the mid list (or vice versa), and a
    // bench with an empty hi list gates nothing
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q1":0.5},"superlinear":["q222"],""" +
        """"scaling_hi":{"q256":1.66,"q217":1.35},"superlinear_hi":["q256","q217"]}""")
        .getBytes("UTF-8"))
    assert(ScalingGate.superlinear(bench) === Seq("q222"))
    assert(ScalingGate.superlinearHi(bench) === Seq("q256", "q217"))
    java.nio.file.Files.write(bench,
      """{"queries":{"q1":0.5},"superlinear":[],"superlinear_hi":[]}""".getBytes("UTF-8"))
    assert(ScalingGate.superlinear(bench).isEmpty && ScalingGate.superlinearHi(bench).isEmpty)
    // pre-round-13 bench.json (no hi key at all) parses as no hi flags
    java.nio.file.Files.write(bench,
      """{"queries":{"q1":0.5},"superlinear":[]}""".getBytes("UTF-8"))
    assert(ScalingGate.superlinearHi(bench).isEmpty)
  }

  test("hi-only waivers do not mute the mid-pair gate (scoped tags)") {
    val dir = java.nio.file.Files.createTempDirectory("gatescope")
    val scale = dir.resolve("SCALE.md")
    java.nio.file.Files.write(scale,
      ("SUPERLINEAR-OK-HI: q256 — ambient driver-load artifact, idle reads 0.42\n" +
        "SUPERLINEAR-OK: q999 — output itself quadratic, capped\n").getBytes("UTF-8"))
    // the -HI tag parses into waiversHi ONLY; the plain tag into waivers ONLY
    assert(ScalingGate.waivers(scale) === Set("q999"))
    assert(ScalingGate.waiversHi(scale) === Set("q256"))
    // a hi-waived query flagged on the MID pair must still be unexplained:
    // mid flags honor only the global tag (q256 below stays hot), while a
    // global waiver covers its hi flag too (q999 below is excused)
    val midFlags = Seq("q256", "q999").filterNot(ScalingGate.waivers(scale))
    assert(midFlags === Seq("q256"))
    val hiFlags = Seq("q256", "q999")
      .filterNot(ScalingGate.waivers(scale) ++ ScalingGate.waiversHi(scale))
    assert(hiFlags.isEmpty)
  }
}
