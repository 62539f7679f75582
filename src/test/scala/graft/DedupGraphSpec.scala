package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The parquet-backed near-dup graph artifact (build / read / append /
  * replay): the "computed once per corpus generation" relation that
  * q101/q118/q129 consume instead of re-hashing the corpus.
  */
class DedupGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    Files.createTempDirectory("graft_ddg_spec").toString

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("ia"), col("ib"), col("hamming").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def compSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("canonical_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("buildDedupGraph artifact reproduces the in-memory pairs, components and meta") {
    val docs = Tables.documents(spark, sf)
    val path = tmp()
    DedupOps.buildDedupGraph(docs, "doc_id", "text", path, 3)

    val memPairs = DedupOps.simhashExactPairs(docs, "doc_id", "text", 3)
      .localCheckpoint(false)
    val expPairs = pairSet(memPairs)
    assert(expPairs.nonEmpty) // testdata plants exact dups -> hamming-0 pairs
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == expPairs)

    val expComp = compSet(DedupOps.nearDupGroupsStar(
      docs.select(col("doc_id")), "doc_id", memPairs))
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == expComp)
    // every corpus doc appears exactly once (singletons included)
    assert(expComp.size == docs.count())

    assert(spark.read.parquet(s"$path/meta").head().getInt(0) == 3)
  }

  test("appendToDedupGraph equals a full rebuild over corpus + batch") {
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val mid = docs.agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY doc_id)"))
      .head().getDouble(0).toLong
    val corpus = docs.filter(col("doc_id") <= mid)
    val batch = docs.filter(col("doc_id") > mid)

    val path = tmp()
    DedupOps.buildDedupGraph(corpus, "doc_id", "text", path, 3)
    DedupOps.appendToDedupGraph(batch, "doc_id", "text", path)

    val expPairs = pairSet(DedupOps.simhashExactPairs(docs, "doc_id", "text", 3))
    // the interesting arm: pairs that straddle the corpus/batch split —
    // found by the batch-vs-corpus chunk join, not the original build
    val cross = expPairs.filter { case (a, b, _) => a <= mid && b > mid }
    assert(cross.nonEmpty, s"no cross-split pairs at mid=$mid; split uninformative")
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == expPairs)

    val expComp = compSet(DedupOps.nearDupGroupsStar(
      docs.select(col("doc_id")), "doc_id",
      DedupOps.simhashExactPairs(docs, "doc_id", "text", 3)))
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == expComp)
  }

  test("winnow-fp index artifact reproduces the direct winnowing results") {
    val docs = Tables.documents(spark, sf)
    val path = tmp()
    DedupOps.buildWinnowFpIndex(docs, "doc_id", "text", 6, 5, path)
    val fps = DedupOps.winnowFps(spark, path)

    val direct = DedupOps.repeatedPassages(docs, "doc_id", "text", 6, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaIdx = DedupOps.repeatedPassagesFromFp(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaIdx == direct)
    assert(direct.nonEmpty)

    val directPairs = DedupOps.repeatedPassagePairs(docs, "doc_id", "text", 6, 5, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaIdxPairs = DedupOps.repeatedPassagePairsFromFp(fps, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIdxPairs == directPairs)

    // meta records the fingerprint parameters
    val meta = spark.read.parquet(s"$path/meta").head()
    assert((meta.getInt(0), meta.getInt(1)) == ((6, 5)))
  }

  test("replayed append is idempotent through the reader dedup") {
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val mid = docs.agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY doc_id)"))
      .head().getDouble(0).toLong
    val corpus = docs.filter(col("doc_id") <= mid)
    val batch = docs.filter(col("doc_id") > mid)

    val path = tmp()
    DedupOps.buildDedupGraph(corpus, "doc_id", "text", path, 3)
    DedupOps.appendToDedupGraph(batch, "doc_id", "text", path)
    val pairs1 = pairSet(DedupOps.dedupGraphPairs(spark, path))
    val comp1 = compSet(DedupOps.dedupGraphComponents(spark, path))

    // at-least-once delivery: the same batch lands again
    DedupOps.appendToDedupGraph(batch, "doc_id", "text", path)
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == pairs1)
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == comp1)
    // components still cover every doc exactly once despite duplicate sig rows
    assert(comp1.size == docs.count())
  }

  test("removeFromDedupGraph splits a bridged component, repairs only it") {
    // hand-authored artifact: 1—2—3 chained (2 bridges) plus a separate
    // pair 10—11 and a singleton 20; taking down 2 must SPLIT {1,2,3}
    // into {1} and {3} while {10,11} and {20} pass through untouched
    val path = tmp()
    Seq((1L, 11L), (2L, 12L), (3L, 13L), (10L, 20L), (11L, 21L), (20L, 30L))
      .toDF("id", "simhash").write.parquet(s"$path/sigs")
    Seq((1L, 2L, 1L), (2L, 3L, 1L), (10L, 11L, 0L))
      .toDF("ia", "ib", "hamming").write.parquet(s"$path/pairs")
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
      .toDF("id", "canonical_id").write.parquet(s"$path/components")
    Seq(3).toDF("max_dist").write.parquet(s"$path/meta")

    DedupOps.removeFromDedupGraph(Seq(2L).toDF("doc_id"), "doc_id", path)
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) ==
      Set((1L, 1L), (3L, 3L), (10L, 10L), (11L, 10L), (20L, 20L)))
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == Set((10L, 11L, 0L)))
    assert(DedupOps.dedupGraphSigs(spark, path).filter(col("id") === 2L).isEmpty)

    // replayed takedown is a no-op (idempotent through the tombstone dedup)
    DedupOps.removeFromDedupGraph(Seq(2L).toDF("doc_id"), "doc_id", path)
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) ==
      Set((1L, 1L), (3L, 3L), (10L, 10L), (11L, 10L), (20L, 20L)))
  }

  test("append -> takedown -> re-admit round-trip restores the full graph") {
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val path = tmp()
    DedupOps.buildDedupGraph(docs, "doc_id", "text", path, 3)
    val fullPairs = pairSet(DedupOps.dedupGraphPairs(spark, path))
    val fullComps = compSet(DedupOps.dedupGraphComponents(spark, path))
    assert(fullPairs.nonEmpty)

    // take down one endpoint of a real near-dup pair
    val (va, vb, _) = fullPairs.head
    DedupOps.removeFromDedupGraph(Seq(va).toDF("doc_id"), "doc_id", path)
    val afterPairs = pairSet(DedupOps.dedupGraphPairs(spark, path))
    assert(!afterPairs.exists(p => p._1 == va || p._2 == va))
    assert(!compSet(DedupOps.dedupGraphComponents(spark, path)).exists(_._1 == va))
    // the surviving endpoint remains covered by the repaired components
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)).exists(_._1 == vb))
    // admission probes no longer collide with the taken-down signature
    assert(DedupOps.dedupGraphSigs(spark, path).filter(col("id") === va).isEmpty)

    // the doc returns (re-licensed): the SAME append path un-tombstones
    DedupOps.appendToDedupGraph(docs.filter(col("doc_id") === va),
      "doc_id", "text", path)
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == fullPairs)
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == fullComps)

    // physical compaction drops tombstoned bytes without changing reads
    DedupOps.removeFromDedupGraph(Seq(va).toDF("doc_id"), "doc_id", path)
    val preCompactPairs = pairSet(DedupOps.dedupGraphPairs(spark, path))
    val preCompactComps = compSet(DedupOps.dedupGraphComponents(spark, path))
    DedupOps.compactDedupGraph(spark, path)
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == preCompactPairs)
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == preCompactComps)
    assert(spark.read.parquet(s"$path/sigs").filter(col("id") === va).isEmpty)
  }
}
