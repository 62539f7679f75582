package graft

import java.nio.file.Files
import java.time.Instant

import graft.sink.Sinks
import graft.sources.{Sources, TableConfigCache}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("csv staging view round-trips with null placeholder (S6)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(dir, "part.tsv"),
      s"1\talice\t__artie_null_value\n2\tbob\t9.5\n")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val df = Sources.csvStagingView(spark, "stg_test", s"$dir/part.tsv", schema)
    val rows = spark.table("stg_test").orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 9.5)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
  }

  test("table config cache honors TTL and invalidation (S7)") {
    val dir = Files.createTempDirectory("graft_cache").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    var now = Instant.parse("2024-01-01T00:00:00Z")
    var fetches = 0
    val cache = new TableConfigCache(spark, ttlSeconds = 3600, clock = () => now) {
      override protected def fetch(t: String): StructType = { fetches += 1; super.fetch(t) }
    }
    cache.schemaOf(dir); cache.schemaOf(dir)
    assert(fetches == 1) // cached
    now = now.plusSeconds(7200)
    cache.schemaOf(dir)
    assert(fetches == 2) // TTL expired
    cache.invalidate(dir)
    cache.schemaOf(dir)
    assert(fetches == 3) // explicit invalidation after DDL
  }

  test("partitioned parquet sink writes the reference's date layout (K3)") {
    val base = Files.createTempDirectory("graft_k3").toString
    val df = Seq((1L, "2024-01-15 10:00:00"), (2L, "2024-01-16 11:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    Sinks.partitionedParquet(df, base, "db.schema.orders", "ts")
    val dirs = new java.io.File(s"$base/db.schema.orders").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("date=2024-01-15", "date=2024-01-16"))
    val back = spark.read.parquet(s"$base/db.schema.orders")
    assert(back.count() == 2 && back.columns.contains("date"))
  }

  test("foreachPartition KV sink amortizes the client per partition (K7/K8 shape)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(2)
    Sinks.foreachPartitionSink(df, Seq("id"))(() => KvProbe.newClient()) {
      (c, key, row) => KvProbe.record(c, key, row.getAs[String]("v"))
    }()
    assert(KvProbe.entries().toMap == Map("1" -> "a", "2" -> "b", "3" -> "c"))
    assert(KvProbe.clients() >= 1 && KvProbe.clients() <= 2) // per-partition, not per-row
  }

  test("withRetries: full-jitter envelope retries transient failures only") {
    import graft.Retries._
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val cfg = RetryConfig(baseMs = 100, maxMs = 3500, maxAttempts = 15,
      sleep = sleeps += _, seed = Some(42L))
    val out = withRetries(cfg) {
      calls += 1
      if (calls < 4) throw new RuntimeException("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 4)
    // sleep_n < min(cap, base * 2^n) — the reference's jitter bound
    assert(sleeps.toSeq.zipWithIndex.forall { case (s, i) =>
      s >= 0 && s < math.min(3500L, 100L << i)
    })
    calls = 0
    intercept[RuntimeException](withRetries(cfg.copy(maxAttempts = 3)) {
      calls += 1; throw new RuntimeException("down")
    })
    assert(calls == 3) // terminal failure after exactly maxAttempts
    calls = 0
    intercept[IllegalArgumentException](
      withRetries(cfg.copy(isRetryable = !_.isInstanceOf[IllegalArgumentException])) {
        calls += 1; throw new IllegalArgumentException("bad")
      })
    assert(calls == 1) // non-retryable: no second attempt
  }

  test("KV sink publishes survive transient per-row failures via the retry envelope") {
    val df = Seq((7L, "x")).toDF("id", "v").repartition(1)
    KvProbe.failNextSends(2) // first two attempts throw, third lands
    Sinks.foreachPartitionSink(df, Seq("id"),
      graft.Retries.RetryConfig(baseMs = 1, maxMs = 2, seed = Some(1L)))(
      () => KvProbe.newClient()) {
      (c, key, row) => KvProbe.recordFlaky(c, key, row.getAs[String]("v"))
    }()
    assert(KvProbe.entries()("7") == "x")
  }

  test("canonicalStrings renders every type with the null placeholder") {
    val df = Seq((1L, Some(2.5), Some(true)), (2L, None, None))
      .toDF("id", "score", "flag")
    val out = Sinks.canonicalStrings(df).orderBy("id").collect()
    assert(out(0).getString(2) == "true")
    assert(out(1).getString(1) == Constants.NullValuePlaceholder)
    assert(out(1).getString(2) == Constants.NullValuePlaceholder)
  }

  test("soft-partition routed append: reference routing policy (P12 wired)") {
    val base = Files.createTempDirectory("graft_softpart").toString + "/t"
    // execution time pinned mid-2024 so the partition classes are stable
    val now = Some(java.time.Instant.parse("2024-02-10T00:00:00Z"))
    // pre-create ONLY the January target: its partition table "existed"
    // while current — late January data must land there, while March…
    // er, 2023-11 (past, never created) must fall back to the compacted
    // table (soft_partition.go:33-43)
    Sinks.appendParquet(
      Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("id", "ts"),
      s"${base}_2024_01")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00")), // past, table exists
      (2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00")), // current partition
      (3L, java.sql.Timestamp.valueOf("2023-11-20 00:00:00")), // past, never created
    ).toDF("id", "ts")
    val targets = Sinks.softPartitionedAppend(df, base, "ts", executionTime = now)
    assert(targets.toSet == Set(s"${base}_2024_01", s"${base}_2024_02", s"${base}_default"))
    assert(spark.read.parquet(s"${base}_2024_01").select("id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(spark.read.parquet(s"${base}_2024_02").select("id").head.getLong(0) == 2L)
    assert(spark.read.parquet(s"${base}_default").select("id").head.getLong(0) == 3L)
    // a FUTURE partition rejects the batch (soft_partition.go:29-32)
    val future = Seq((9L, java.sql.Timestamp.valueOf("2099-01-01 00:00:00"))).toDF("id", "ts")
    val e = intercept[IllegalArgumentException](
      Sinks.softPartitionedAppend(future, base, "ts", executionTime = now))
    assert(e.getMessage.contains("_2099_01") && e.getMessage.contains("future"))
    // documented deviation: a NULL timestamp routes to _default instead
    // of failing the batch
    val withNull = Seq((4L, null.asInstanceOf[java.sql.Timestamp])).toDF("id", "ts")
    Sinks.softPartitionedAppend(withNull, base, "ts", executionTime = now)
    assert(spark.read.parquet(s"${base}_default").select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // stream-survival mode (the SinkRegistry wiring): future rows FOLD
    // into the compacted table instead of wedging the stream, alongside
    // whatever other rows share that target
    val mixed = Seq(
      (5L, java.sql.Timestamp.valueOf("2099-01-01 00:00:00")), // future
      (6L, java.sql.Timestamp.valueOf("2024-02-11 00:00:00")), // current
    ).toDF("id", "ts")
    val t2 = Sinks.softPartitionedAppend(mixed, base, "ts", executionTime = now,
      rejectFuture = false)
    assert(t2.toSet == Set(s"${base}_2024_02", s"${base}_default"))
    assert(spark.read.parquet(s"${base}_default").select("id")
      .collect().map(_.getLong(0)).toSet == Set(3L, 4L, 5L))
    assert(spark.read.parquet(s"${base}_2024_02").select("id")
      .collect().map(_.getLong(0)).toSet == Set(2L, 6L))
  }

  test("sink registry dispatches by label and rejects unknown (K9)") {
    import graft.sink.SinkRegistry
    import graft.streaming.CdcPipeline
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    val target = Files.createTempDirectory("graft_reg").toString + "/t"
    val batch = Seq((1L, "a", 1L, false, "c"))
      .toDF("id", "name", "off", Constants.DeleteCol, Constants.OperationCol)
    val merge = SinkRegistry.sink("merge", cfg)
    merge(batch, 0L, target)
    assert(spark.read.parquet(target).count() == 1)
    // the same Sink instance must honor later batch ids (replay marker)
    merge(Seq((2L, "b", 2L, false, "c"))
      .toDF("id", "name", "off", Constants.DeleteCol, Constants.OperationCol), 1L, target)
    assert(spark.read.parquet(target).count() == 2)
    val app = Files.createTempDirectory("graft_reg2").toString + "/a"
    SinkRegistry.sink("append", cfg)(batch.drop(Constants.OperationCol), 0L, app)
    assert(spark.read.parquet(app).count() == 1)
    assertThrows[IllegalArgumentException] { SinkRegistry.sink("snowpipe", cfg) }
  }
}

/** JVM-static probe for the KV sink test (executors share the JVM in
  * local mode).
  */
object KvProbe {
  private val map = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val clientCount = new java.util.concurrent.atomic.AtomicInteger(0)
  def newClient(): java.util.Map[String, String] = { clientCount.incrementAndGet(); map }
  def record(c: java.util.Map[String, String], k: String, v: String): Unit = { c.put(k, v); () }
  def entries(): scala.collection.mutable.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    map.asScala
  }
  def clients(): Int = clientCount.get()

  private val failuresLeft = new java.util.concurrent.atomic.AtomicInteger(0)
  def failNextSends(n: Int): Unit = failuresLeft.set(n)
  def recordFlaky(c: java.util.Map[String, String], k: String, v: String): Unit = {
    if (failuresLeft.getAndDecrement() > 0) throw new RuntimeException("transient publish error")
    c.put(k, v)
    ()
  }
}
