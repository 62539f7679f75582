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
}
