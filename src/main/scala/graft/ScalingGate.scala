package graft

/** The scaling-sweep gate policy, shared by [[Bench]] (loud stderr the
  * moment a sweep flags a quadratic plan) and `ScalingGateSpec` (turns the
  * flag into a `sbt test` failure). Round 8 shipped q222 with the sweep
  * correctly reporting exponent 1.57 — the flag was emitted but nothing
  * acted on it; this module is the acting-on-it.
  *
  * Contract: every entry of `bench.json`'s `"superlinear"` list must
  * either be fixed (drop out of the list on the next sweep) or carry an
  * explicit `SUPERLINEAR-OK: qNN — reason` waiver line in SCALE.md
  * documenting the cap that bounds it. Anything else fails the build.
  */
object ScalingGate {
  /** Gate threshold on the measured sf0.01→sf0.1 scaling exponent.
    * Round 10 tightened 1.5 → 1.2: the 1.5 gate let q158's 1.33 ship —
    * 10× data ⇒ ~21× time — while every healthy plan in the suite
    * measures ≤ 1.1 (shuffle-bounded plans sit below 1 at these SFs
    * because fixed overhead amortizes). 1.2 leaves noise headroom above
    * the healthy band but fails anything with genuinely super-linear
    * candidate growth.
    */
  val Threshold = 1.2

  /** qNN prefixes waived in SCALE.md via `SUPERLINEAR-OK: qNN — reason`.
    * A plain SUPERLINEAR-OK waives BOTH sweep directions; a hi-pair-only
    * excuse (ambient-load artifact on the upward pair while the mid pair
    * stays healthy and gated) must use [[waiversHi]]'s tag instead —
    * otherwise excusing a noisy hi reading would silently mute the mid
    * gate for that query too, the exact flag-emitted-but-ignored failure
    * this module exists to prevent.
    *
    * A plain tag is a SEMANTIC waiver (the query's output or contract is
    * legitimately superlinear, bounded by a documented cap) and needs no
    * measurement to back it. The -HI tag is an AMBIENT-MEASUREMENT
    * excuse, and since round 15 it is only honored when the artifact of
    * record carries corroborating fresh-JVM evidence — see
    * [[unexplained]].
    */
  def waivers(scaleMd: java.nio.file.Path = java.nio.file.Paths.get("SCALE.md")): Set[String] =
    tagged(scaleMd, "SUPERLINEAR-OK")

  /** qNN prefixes waived for the UPWARD pair only, via
    * `SUPERLINEAR-OK-HI: qNN — reason`. The mid-pair gate still applies.
    */
  def waiversHi(scaleMd: java.nio.file.Path = java.nio.file.Paths.get("SCALE.md")): Set[String] =
    tagged(scaleMd, "SUPERLINEAR-OK-HI")

  private def tagged(scaleMd: java.nio.file.Path, tag: String): Set[String] =
    if (!java.nio.file.Files.exists(scaleMd)) Set.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(scaleMd), "UTF-8")
      (tag + """:\s*(q\d+)""").r.findAllMatchIn(txt).map(_.group(1)).toSet
    }

  /** The `"superlinear"` list of a bench.json, empty if the file or the
    * sweep block is absent (fresh clone / sweep disabled — nothing to
    * gate on).
    */
  def superlinear(benchJson: java.nio.file.Path = java.nio.file.Paths.get("bench.json")): Seq[String] =
    keyList(benchJson, "superlinear")

  /** The `"superlinear_hi"` list — UPWARD-pair (derived ×3 corpus) flags,
    * gated since round 13. [[graft.Bench]] already auto-drops entries
    * whose row readout shows output growth ≥ time growth (an
    * output-driven alpha is the query legitimately emitting more), so
    * everything in this list is unexplained time growth at the scale
    * direction that matters.
    */
  def superlinearHi(benchJson: java.nio.file.Path = java.nio.file.Paths.get("bench.json")): Seq[String] =
    keyList(benchJson, "superlinear_hi")

  private def keyList(benchJson: java.nio.file.Path, key: String): Seq[String] =
    if (!java.nio.file.Files.exists(benchJson)) Seq.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(benchJson), "UTF-8")
      ("\"" + key + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(txt)
        .map(m => """q\d+""".r.findAllIn(m.group(1)).toSeq)
        .getOrElse(Seq.empty)
    }

  /** The `"scaling_hi_fresh"` block — fresh-JVM paired re-measurements
    * ([[graft.Remeasure]]) recorded for upward-pair flags the in-suite
    * calibration probe could not explain. Maps qNN → fresh alpha.
    */
  def scalingHiFresh(benchJson: java.nio.file.Path = java.nio.file.Paths.get("bench.json")): Map[String, Double] =
    if (!java.nio.file.Files.exists(benchJson)) Map.empty
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(benchJson), "UTF-8")
      """"scaling_hi_fresh":\{""".r.findFirstMatchIn(txt).map { m =>
        // entries are nested one level: "qNN":{...,"alpha":X}
        val rest = txt.substring(m.end)
        """"(q\d+)":\{[^}]*"alpha":(-?[0-9.]+|NaN)[^}]*\}""".r.findAllMatchIn(
          rest.take(rest.indexOf("}}") + 2))
          .flatMap(e => e.group(2).toDoubleOption.map(e.group(1) -> _)).toMap
      }.getOrElse(Map.empty)
    }

  /** True when the artifact's upward sweep carries its calibration
    * evidence: a bench.json with a `scaling_hi` block MUST also record
    * `scaling_hi_cal` and `scaling_hi_detail` (the round-14 probe
    * machinery) — an artifact that flags without the evidence that lets
    * the flag be adjudicated is itself a gate failure (round 15, verdict
    * item 5: the probe contract must not silently regress).
    */
  def hiEvidenceComplete(benchJson: java.nio.file.Path = java.nio.file.Paths.get("bench.json")): Boolean =
    if (!java.nio.file.Files.exists(benchJson)) true
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(benchJson), "UTF-8")
      !txt.contains("\"scaling_hi\":") ||
        (txt.contains("\"scaling_hi_cal\":") && txt.contains("\"scaling_hi_detail\":"))
    }

  /** Adjudication of ONE upward-pair flag candidate (alpha above
    * [[Threshold]]), in waiver-precedence order. Pure — [[graft.Bench]]
    * feeds it live sweep readings; ScalingGateSpec pins the precedence.
    *
    *  1. `CalibrationWaived` — the probe-calibrated exponent clears the
    *     gate AND the hi-side probes corroborate ambient load (median
    *     probe ≥ 1.2× the steady-state reference measured OUTSIDE the
    *     query pairs — r14's advisor note: the base-side probe is
    *     measured right after a base query and can itself be inflated).
    *  2. `OutputDriven` — the result set grew at least as fast as the
    *     time; emitting proportionally more rows is the query working.
    *  3. `FreshJvmWaived` — a [[graft.Remeasure]] fork (no inherited
    *     JVM state) read the pair at or below the threshold; the
    *     in-suite flag was accumulated-state artifact.
    *  4. `Flagged` — unexplained; lands in `superlinear_hi` and fails
    *     the build unless [[unexplained]]'s text-waiver-plus-evidence
    *     rule clears it.
    */
  sealed trait HiVerdict
  case object CalibrationWaived extends HiVerdict
  case object OutputDriven extends HiVerdict
  case object FreshJvmWaived extends HiVerdict
  case object Flagged extends HiVerdict

  def hiVerdict(alpha: Double, hiFactor: Int,
                calAlpha: Option[Double], probeMedHi: Double, probeSteady: Double,
                rows: Option[(Long, Long)],
                freshAlpha: Option[Double]): HiVerdict = {
    val probesCorroborate = probeSteady > 0 && probeMedHi >= 1.2 * probeSteady
    val outputDriven = rows.exists { case (b, h) =>
      h.toDouble / b.max(1L).toDouble >= math.pow(hiFactor.toDouble, alpha)
    }
    if (probesCorroborate && calAlpha.exists(_ <= Threshold)) CalibrationWaived
    else if (outputDriven) OutputDriven
    else if (freshAlpha.exists(_ <= Threshold)) FreshJvmWaived
    else Flagged
  }

  /** Flagged-and-unwaived queries (mid AND hi pairs) — must be empty for
    * a green build. Mid flags honor the global (semantic) waiver tag.
    * Hi flags honor the global tag too (a semantic cap subsumes both
    * directions), but the hi-only tag — the ambient-measurement excuse —
    * is only honored when the SAME artifact records fresh-JVM evidence
    * ([[scalingHiFresh]]) at or below [[Threshold]] for that query:
    * round 15's machine-checkable-waiver rule. A text line alone, or a
    * fresh re-measurement that REFUTES the excuse (fresh alpha still
    * above threshold), leaves the flag build-failing. An artifact whose
    * hi sweep ran without its calibration evidence fails wholesale.
    */
  def unexplained(benchJson: java.nio.file.Path = java.nio.file.Paths.get("bench.json"),
                  scaleMd: java.nio.file.Path = java.nio.file.Paths.get("SCALE.md")): Seq[String] = {
    val w = waivers(scaleMd)
    val wHiOnly = waiversHi(scaleMd)
    val fresh = scalingHiFresh(benchJson)
    val hiBad = superlinearHi(benchJson).filter { q =>
      val semantic = w(q)
      val ambientExcuse = wHiOnly(q) && fresh.get(q).exists(_ <= Threshold)
      !semantic && !ambientExcuse
    }
    val evidenceGap =
      if (hiEvidenceComplete(benchJson)) Seq.empty
      else Seq("hi-sweep-evidence-missing")
    (superlinear(benchJson).filterNot(w) ++ hiBad ++ evidenceGap).distinct
  }
}
