package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: FastSS deletion-neighborhood edit-distance pairs. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def levRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("fastSsPairs: equals brute-force Levenshtein on hash-scattered codes") {
    // variable-length strings over a 5-letter alphabet, like compact
    // journey encodings; includes exact dups (lev 0) and indel shifts
    val strs = (1L to 80L).map { i =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"fs$i"))
      val len = 6 + (h % 3L).toInt // 6..8
      (i, (0 until len).map(p => ('a' + ((h >> (p * 3)) & 3L).toInt).toChar).mkString)
    }
    val got = DedupOps.fastSsPairs(strs.toDF("id", "s"), "id", "s", 2, 8)
      .select(col("ia"), col("ib"), col("lev"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = (for {
      (i, si) <- strs; (j, sj) <- strs if i < j
      d = levRef(si, sj) if d <= 2
    } yield (i, j, d.toLong)).sorted
    assert(got === brute && brute.nonEmpty)
    // sanity: the alphabet/length mix actually exercises indels
    assert(strs.map(_._2.length).distinct.size > 1)
  }

  test("fastSsPairs: shifted journeys collide through the indel variant") {
    // hamming distance 8 but lev 2 (drop head, append tail): the pair
    // MUST surface — this is what position-blocked schemes miss
    val df = Seq((1L, "xabcdefg"), (2L, "abcdefgy")).toDF("id", "s")
    val got = DedupOps.fastSsPairs(df, "id", "s", 2, 8)
      .select(col("ia"), col("ib"), col("lev"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L)))
  }

  test("sequentialPairSupport: equals brute-force subsequence containment") {
    import graft.operators.TemporalOps
    // hash-scattered event streams over a 4-item alphabet, uneven lengths
    val rows = (1L to 30L).flatMap { u =>
      val h = graft.functions.DebeziumCodec.fingerprint64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"sq$u"))
      val len = 1 + (h % 10L).toInt // 1..10 events, some beyond maxLen 8
      (0 until len).map(i => (u, s"e${(h >> (i * 2)) & 3L}", i.toLong, i.toLong))
    }
    val got = TemporalOps.sequentialPairSupport(
        rows.toDF("u", "it", "ord", "tie"), "u", "it", "ord", "tie", 8, 1L)
      .as[(String, String, Long)].collect().toSeq.sorted
    val brute = rows.groupBy(_._1).values.map { evs =>
      val seq8 = evs.sortBy(e => (e._3, e._4)).map(_._2).take(8)
      (for { i <- seq8.indices; j <- (i + 1) until seq8.length }
        yield (seq8(i), seq8(j))).toSet
    }.toSeq.flatten.groupBy(identity).map { case (p, hits) =>
      (p._1, p._2, hits.size.toLong)
    }.toSeq.sorted
    assert(got === brute && brute.nonEmpty)
    // set semantics: a user repeating (a, b) twice still counts once —
    // pinned via a hand fixture
    val fix = Seq((1L, "a", 0L), (1L, "b", 1L), (1L, "a", 2L), (1L, "b", 3L),
      (2L, "a", 0L), (2L, "b", 1L))
    val got2 = TemporalOps.sequentialPairSupport(
        fix.map(t => (t._1, t._2, t._3, t._3)).toDF("u", "it", "ord", "tie"),
        "u", "it", "ord", "tie", 8, 2L)
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(got2 === Seq(("a", "b", 2L))) // never 3, never (b, a) at 2
  }

  test("fastSsPairs: strings past maxLen fail loudly, never lose recall") {
    val df = Seq((1L, "abcdefghi"), (2L, "abcdefgh")).toDF("id", "s")
    val e = intercept[Exception] {
      DedupOps.fastSsPairs(df, "id", "s", 2, 8).collect()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      DedupOps.fastSsPairs(df, "id", "s", 3, 8)
    }
  }
}
