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

  // ---- round 15: the probe contract is spec-pinned (verdict item 5) ----

  test("hiVerdict waiver precedence: probe-corroborated calibration > output rows > fresh JVM > flagged") {
    import ScalingGate._
    // probes elevated (1.3x steady) + calibrated under threshold wins even
    // when the row readout would ALSO explain the alpha
    assert(hiVerdict(1.5, 3, calAlpha = Some(0.9), probeMedHi = 0.39, probeSteady = 0.30,
      rows = Some((100L, 600L)), freshAlpha = None) === CalibrationWaived)
    // flat probes kill the calibration waiver even with cal under threshold
    // (a noisy lone probe must not normalize a genuinely superlinear plan);
    // the row readout then carries it
    assert(hiVerdict(1.5, 3, calAlpha = Some(0.9), probeMedHi = 0.30, probeSteady = 0.30,
      rows = Some((100L, 600L)), freshAlpha = None) === OutputDriven)
    // rows must grow at least as fast as time: 3x rows at alpha 1.5
    // (time 5.2x) is NOT output-driven; a fresh-JVM reading under the
    // threshold is the remaining evidence
    assert(hiVerdict(1.5, 3, calAlpha = None, probeMedHi = 0.30, probeSteady = 0.30,
      rows = Some((100L, 300L)), freshAlpha = Some(0.57)) === FreshJvmWaived)
    // nothing explains it — flag stands
    assert(hiVerdict(1.5, 3, calAlpha = Some(1.4), probeMedHi = 0.30, probeSteady = 0.30,
      rows = Some((100L, 300L)), freshAlpha = Some(1.6)) === Flagged)
    // a fresh fork that never produced an alpha is no evidence
    assert(hiVerdict(1.5, 3, calAlpha = None, probeMedHi = 0.30, probeSteady = 0.30,
      rows = None, freshAlpha = None) === Flagged)
  }

  test("a hi text waiver alone no longer clears a flag — fresh-JVM evidence in the artifact is required") {
    val dir = java.nio.file.Files.createTempDirectory("gatefresh")
    val scale = dir.resolve("SCALE.md")
    val bench = dir.resolve("bench.json")
    java.nio.file.Files.write(scale,
      "SUPERLINEAR-OK-HI: q256 — ambient story, prose only\n".getBytes("UTF-8"))
    // flagged + text-waived + NO fresh evidence => still unexplained
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q256":3.5},"superlinear":[],"scaling_hi":{"q256":1.55},""" +
        """"scaling_hi_cal":{"q256":1.58},"scaling_hi_detail":{"q256":[[0.1,3.8,0.1,20.9]]},""" +
        """"superlinear_hi":["q256"]}""").getBytes("UTF-8"))
    assert(ScalingGate.unexplained(bench, scale) === Seq("q256"))
    // flagged + text-waived + fresh evidence UNDER the threshold => cleared
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q256":3.5},"superlinear":[],"scaling_hi":{"q256":1.55},""" +
        """"scaling_hi_cal":{"q256":1.58},"scaling_hi_detail":{"q256":[[0.1,3.8,0.1,20.9]]},""" +
        """"superlinear_hi":["q256"],""" +
        """"scaling_hi_fresh":{"q256":{"base":[4.64,5.79],"hi":[8.73,9.10],"alpha":0.57}}}""")
        .getBytes("UTF-8"))
    assert(ScalingGate.scalingHiFresh(bench) === Map("q256" -> 0.57))
    assert(ScalingGate.unexplained(bench, scale).isEmpty)
    // fresh evidence that REFUTES the excuse (alpha still hot) => flagged
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q256":3.5},"superlinear":[],"scaling_hi":{"q256":1.55},""" +
        """"scaling_hi_cal":{"q256":1.58},"scaling_hi_detail":{"q256":[[0.1,3.8,0.1,20.9]]},""" +
        """"superlinear_hi":["q256"],""" +
        """"scaling_hi_fresh":{"q256":{"base":[4.64],"hi":[40.2],"alpha":1.96}}}""")
        .getBytes("UTF-8"))
    assert(ScalingGate.unexplained(bench, scale) === Seq("q256"))
    // a PLAIN (semantic) waiver still covers its hi flag without evidence
    java.nio.file.Files.write(scale,
      "SUPERLINEAR-OK: q256 — output itself superlinear, capped\n".getBytes("UTF-8"))
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q256":3.5},"superlinear":[],"scaling_hi":{"q256":1.55},""" +
        """"scaling_hi_cal":{"q256":1.58},"scaling_hi_detail":{"q256":[[0.1,3.8,0.1,20.9]]},""" +
        """"superlinear_hi":["q256"]}""").getBytes("UTF-8"))
    assert(ScalingGate.unexplained(bench, scale).isEmpty)
  }

  test("an artifact whose hi sweep ran without its calibration evidence fails wholesale") {
    val dir = java.nio.file.Files.createTempDirectory("gateevidence")
    val scale = dir.resolve("SCALE.md")
    java.nio.file.Files.write(scale, "".getBytes("UTF-8"))
    val bench = dir.resolve("bench.json")
    // scaling_hi present but cal/detail missing — the round-14 probe
    // machinery silently regressed; the gate must say so
    java.nio.file.Files.write(bench,
      """{"queries":{"q1":0.5},"superlinear":[],"scaling_hi":{"q1":0.4},"superlinear_hi":[]}"""
        .getBytes("UTF-8"))
    assert(!ScalingGate.hiEvidenceComplete(bench))
    assert(ScalingGate.unexplained(bench, scale) === Seq("hi-sweep-evidence-missing"))
    // with the evidence present the same artifact is green
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q1":0.5},"superlinear":[],"scaling_hi":{"q1":0.4},""" +
        """"scaling_hi_cal":{"q1":0.41},"scaling_hi_detail":{"q1":[[0.1,1.0,0.1,1.5]]},""" +
        """"superlinear_hi":[]}""").getBytes("UTF-8"))
    assert(ScalingGate.hiEvidenceComplete(bench))
    assert(ScalingGate.unexplained(bench, scale).isEmpty)
    // an artifact with NO hi sweep at all (dev run) carries no obligation
    java.nio.file.Files.write(bench,
      """{"queries":{"q1":0.5},"superlinear":[]}""".getBytes("UTF-8"))
    assert(ScalingGate.hiEvidenceComplete(bench))
  }

  test("the Remeasure stdout line round-trips through Bench's parser (cross-process contract)") {
    // exactly the line Remeasure.main prints
    val line = """{"remeasure":"q256_temporal_reach","base":[5.60,8.94,5.31],""" +
      """"hi":[52.55,19.33,14.89],"alpha":0.94}"""
    assert(Bench.parseRemeasureLine(line) ===
      ((Seq(5.60, 8.94, 5.31), Seq(52.55, 19.33, 14.89), Some(0.94))))
    // a side that never succeeded: empty array + null alpha => no evidence
    val failed = """{"remeasure":"q1_x","base":[],"hi":[2.00],"alpha":null}"""
    assert(Bench.parseRemeasureLine(failed) === ((Seq.empty, Seq(2.00), None)))
  }

  test("scalingHiFresh parses multi-entry blocks and null alphas") {
    val dir = java.nio.file.Files.createTempDirectory("gatefreshparse")
    val bench = dir.resolve("bench.json")
    java.nio.file.Files.write(bench,
      ("""{"queries":{"q1":0.5},"scaling_hi_fresh":{""" +
        """"q256":{"base":[4.64],"hi":[8.73],"alpha":0.57},""" +
        """"q300":{"base":[],"hi":[2.0],"alpha":null},""" +
        """"q301":{"base":[1.0],"hi":[9.0],"alpha":2.00}},"superlinear_hi":[]}""")
        .getBytes("UTF-8"))
    val fresh = ScalingGate.scalingHiFresh(bench)
    // the null-alpha entry parses as absent (no evidence), the rest exact
    assert(fresh === Map("q256" -> 0.57, "q301" -> 2.00))
    assert(ScalingGate.scalingHiFresh(dir.resolve("missing.json")) === Map.empty)
  }
}
