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

  /** Flagged-and-unwaived queries (mid AND hi pairs) — must be empty for
    * a green build. Mid flags honor only the global waiver tag; hi flags
    * honor both tags (a global waiver covers the direction it subsumes).
    */
  def unexplained(): Seq[String] = {
    val w = waivers()
    val wHi = w ++ waiversHi()
    (superlinear().filterNot(w) ++ superlinearHi().filterNot(wHi)).distinct
  }
}
