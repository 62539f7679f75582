package graft

import graft.operators.{LinkageOps, QualityOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 regressions: the three oracle-coupled defects the round-13
  * review deferred (SCALE.md "Deferred review items") — each fixture
  * here FAILS on the pre-round-14 code.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- soundexKey ----------------------------------------------------

  test("soundexKey: vowel/H/W/Y initials keep their first consonant " +
    "digit and punctuation is stripped before coding") {
    // old code: ADAM keyed A500 (D's digit eaten by the blind
    // position-2 slice), D'Arcy leaked the apostrophe into the key,
    // WILLIAMS keyed W520
    val exp = Map(
      "ADAM" -> "A350", // archival A350, not A500
      "D'Arcy" -> "D620", // strip-first: codes as DARCY
      "Williams" -> "W452", // W carries no digit; L is the FIRST digit
      "Pfister" -> "P236", // adjacent equal run merges INTO the initial
      "Robert" -> "R163", // consonant initial: unchanged by the repair
      "o'barlen" -> "O164", // the q255 fixture shape
      // the documented REMAINING deviation, pinned so it can't silently
      // widen: H/W act like vowels (run separators are not special-
      // cased), so ASHCRAFT's S/C (both class 2, separated by H)
      // collapse — archival Soundex reads A261
      "Ashcraft" -> "A226")
    val got = exp.keys.toSeq.toDF("n")
      .select(col("n"), LinkageOps.soundexKey(col("n")).as("k"))
      .as[(String, String)].collect().toMap
    assert(got === exp)
  }

  test("soundexKey: property — equals an independent sequential " +
    "implementation of the documented algorithm on random strings") {
    // reference implementation written from the CONTRACT, not the SQL
    // chain: strip non-alpha, code the consonant classes, collapse
    // adjacent equal digits (incl. into the initial), drop zeros, skip
    // the initial's own digit iff it carries one, pad to 3
    def ref(s: String): String = {
      val u = s.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
      val code = "01230120022455012623010202"
      val digits = u.map(c => code(c - 'A'))
      val collapsed = digits.foldLeft("") { (acc, d) =>
        if (acc.nonEmpty && acc.last == d) acc else acc + d
      }
      val stripped = collapsed.filter(_ != '0')
      val tail =
        if (digits.headOption.contains('0')) stripped.take(3)
        else stripped.drop(1).take(3)
      u.take(1) + tail.padTo(3, '0')
    }
    val gen = org.scalacheck.Gen.listOfN(12, org.scalacheck.Gen.frequency(
      8 -> org.scalacheck.Gen.alphaChar,
      1 -> org.scalacheck.Gen.oneOf('\'', '-', ' ', '.'),
      1 -> org.scalacheck.Gen.oneOf('ä', 'é'))).map(_.mkString)
    val names = (0 until 120).flatMap(i => gen.apply(
      org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))
    val got = names.toDF("n")
      .select(col("n"), LinkageOps.soundexKey(col("n")).as("k"))
      .as[(String, String)].collect().toMap
    for (n <- names) assert(got(n) === ref(n), s"input: '$n'")
  }

  // ---- averagePrecisionAtK -------------------------------------------

  test("averagePrecisionAtK: R counts relevants LIST-WIDE and the " +
    "denominator is min(R, k) — relevants past k lower AP") {
    // 5-deep list graded at k=3, rel at ranks 1, 3, 5: hits(1)=1,
    // hits(3)=2; R = 3 (the rank-5 relevant counts), min(R, 3) = 3.
    // AP@3 = (1 + 2/3)/3 = 5/9. Old code divided by the 2 relevants
    // inside top-3 → 5/6.
    val rows = Seq(("q1", 1L, true), ("q1", 2L, false), ("q1", 3L, true),
      ("q1", 4L, false), ("q1", 5L, true))
    val got = QualityOps.averagePrecisionAtK(
        rows.toDF("q", "r", "rel"), "q", "r", col("rel"), 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("q1", 3L, 10L * 1000000L / 18L)))
  }

  test("averagePrecisionAtK: a query whose ranks all sit past k still " +
    "reports its list-wide R with AP 0") {
    val rows = Seq(("q1", 4L, true), ("q1", 5L, true),
      ("q2", 1L, true), ("q2", 2L, false))
    val got = QualityOps.averagePrecisionAtK(
        rows.toDF("q", "r", "rel"), "q", "r", col("rel"), 3)
      .as[(String, Long, Long)].collect().toSeq
    // q2: R = 1, min(R, 3) = 1, AP = P(1) = 1
    assert(got === Seq(("q1", 2L, 0L), ("q2", 1L, 1000000L)))
  }

  // ---- contingencyAssociation ----------------------------------------

  test("contingencyAssociation: NULL is a real category — diagonal " +
    "association through a NULL cell still reads V² = 1e6") {
    // perfect 2x2 association where one diagonal cell is (p, NULL):
    // old code lost the observed count at the equi-join (o read 0) and
    // countDistinct(b) = 1 collapsed the category count, so v2_ppm = 0
    val rows = Seq(("p", None), ("p", None),
      ("q", Some("v")), ("q", Some("v")))
    val got = QualityOps.contingencyAssociation(
      rows.toDF("a", "b"), "a", "b")
    val nullCell = got.filter(col("a") === "p" && col("b").isNull)
      .select("o").as[Long].collect().toSeq
    assert(nullCell === Seq(2L), "the observed NULL cell must survive")
    val tbl = got.select("chi2_ppm", "v2_ppm").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(tbl === Seq((4000000L, 1000000L)))
  }

  test("defaultValueSql renders lazily: a Native/NotImplemented dialect " +
    "never evaluates (or validates) a literal it discards (ADVICE r13)") {
    import graft.sink.DdlDialects
    import org.apache.spark.sql.types.StringType
    // a newline-bearing string default crashes the control-char guard IF
    // rendered — Postgres/DuckDB (NotImplemented) and MySQL (Native)
    // discard the literal and must pass it through untouched
    for (label <- Seq("postgres", "duckdb", "mysql")) {
      val d = DdlDialects(label)
      assert(d.backfillStatements("t", "c",
        d.defaultValueSql("a\nb", StringType)).isEmpty, label)
    }
    // the Backfill dialects DO embed it and must still fail loudly
    val e = intercept[IllegalArgumentException] {
      val bq = DdlDialects("bigquery")
      bq.backfillStatements("t", "c", bq.defaultValueSql("a\nb", StringType))
    }
    assert(e.getMessage.contains("control characters"))
  }

  test("replay marker: the delete-then-rename crash window (marker " +
    "absent, .tmp present) does not re-open the replay window (ADVICE r13)") {
    import graft.streaming.CdcPipeline
    val dir = java.nio.file.Files.createTempDirectory("graft_marker").toString
    val target = s"$dir/t"
    // simulate the crash: recordBatch wrote the .tmp, deleted the main
    // marker, and died before the rename
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${target}__batch.tmp"), "5")
    var ran = 0
    CdcPipeline.runOncePerBatch(spark, target, 5L) { ran += 1 }
    assert(ran == 0, "batch 5 already applied — the .tmp id must be honored")
    CdcPipeline.runOncePerBatch(spark, target, 6L) { ran += 1 }
    assert(ran == 1, "batch 6 is new work")
    // a TORN .tmp parses to -1 and is ignored (the main marker now
    // records 6 from the successful run above)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${target}__batch.tmp"), "garb")
    CdcPipeline.runOncePerBatch(spark, target, 6L) { ran += 1 }
    assert(ran == 1, "replay of 6 stays a no-op under a torn .tmp")
  }

  test("cohensKappa: items unrated by either rater are EXCLUDED — the " +
    "textbook kappa domain (round-14 review)") {
    // old code counted the two null-bearing rows in n while never
    // counting them as agreement or in the marginals: kappa read
    // -200000 where the rated-by-both table gives exactly 0
    val rows: Seq[(Option[String], Option[String])] = Seq(
      (Some("x"), Some("x")), (Some("y"), Some("x")),
      (None, Some("x")), (Some("x"), None))
    val got = QualityOps.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((2L, 1L, 500000L, 500000L, 0L)))
  }

  test("bcubedClusterAudit: a NULL system-cluster label is a real " +
    "cluster — its items stay in the audit domain (round-14 review)") {
    // old code dropped the NULL cell at the size equi-join: n shrank to
    // 2 and the unassigned item silently vanished from both averages
    val sys = Seq((1L, Some("c1")), (2L, Some("c1")), (3L, None))
      .toDF("id", "c")
    val gold = Seq((1L, "g1"), (2L, "g1"), (3L, "g2")).toDF("id", "g")
    val got = QualityOps.bcubedClusterAudit(sys, "id", "c", gold, "id", "g")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // the singleton NULL cluster is pure and complete: perfect B-cubed
    assert(got === ((3L, 2L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("transitionMatrix: stateless (NULL) events are transparent — " +
    "they neither form steps nor swallow them (round-14 review)") {
    // old code let (NULL -> X) pairs into the counts and then dropped
    // them at the row-total equi-join: the a->b journey below produced
    // an EMPTY matrix
    val rows = Seq(("u", 1L, Some("a")), ("u", 2L, None), ("u", 3L, Some("b")))
      .toDF("k", "t", "s")
    val got = graft.operators.GraphOps.transitionMatrix(
        rows, "k", Seq(col("t")), "s")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 1L, 1000L)))
  }

  test("cdcFreshnessEmit: the byte-capped emit loop reports plan-file-" +
    "durable latencies for every probed batch") {
    val lat = Queries.cdcFreshnessEmit(spark, batches = 2,
      rowsPerBatch = 300, triggerMs = 500)
    assert(lat.length == 2 && lat.forall(l => l > 0 && l < 60), lat)
  }

  test("contingencyAssociation: a NULL on the ROW side forms its own " +
    "margin row") {
    val rows = Seq((None, "u"), (None, "u"), (Some("x"), "w"),
      (Some("x"), "w")): Seq[(Option[String], String)]
    val got = QualityOps.contingencyAssociation(
      rows.toDF("a", "b"), "a", "b")
    val rTot = got.filter(col("a").isNull).select("r_tot")
      .distinct().as[Long].collect().toSeq
    assert(rTot === Seq(2L))
    val tbl = got.select("chi2_ppm", "v2_ppm").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(tbl === Seq((4000000L, 1000000L)))
  }
}
