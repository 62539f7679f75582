package graft.schema

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema inference/evolution driver logic (ref: lib/typing/columns/diff.go,
  * clients/shared/table.go:109-162, lib/destination/types/
  * destination_table_config.go:103-129).
  */
object SchemaEvolution {
  /** Columns never materialized to a destination (diff.go:16-19). */
  private val transientCols = Set(graft.Constants.OnlySetDeleteCol)

  case class Diff(toAdd: Seq[StructField], toDrop: Seq[StructField])

  /** Source-vs-destination diff, keeping artie metadata columns off the
    * drop list (diff.go:29-82).
    */
  def diff(source: StructType, destination: StructType): Diff = {
    val srcNames = source.fieldNames.toSet
    val dstNames = destination.fieldNames.toSet
    Diff(
      toAdd = source.fields.toSeq.filterNot(f => dstNames.contains(f.name) || transientCols.contains(f.name)),
      toDrop = destination.fields.toSeq.filterNot(f => srcNames.contains(f.name) || f.name.startsWith("__artie")),
    )
  }

  /** Type reconciliation for a column seen with two different types across
    * batches, via the Kind lattice (lib/typing semantics): invalid upgrades,
    * ints widen, int+float -> float, conflicts degrade to string.
    */
  def resolveType(a: DataType, b: DataType): DataType = {
    import graft.types.Kind
    if (a == b) a
    else {
      def toKind(dt: DataType): Kind = dt match {
        case NullType => Kind.Invalid
        case BooleanType => Kind.Bool
        case ShortType => Kind.Int(16)
        case IntegerType => Kind.Int(32)
        case LongType => Kind.Int(64)
        case FloatType | DoubleType => Kind.Float
        case d: DecimalType => Kind.Dec(d.precision, d.scale)
        case BinaryType => Kind.Bytes
        case DateType => Kind.Date
        case TimestampType => Kind.TimestampTz
        case TimestampNTZType => Kind.TimestampNtz
        case _ => Kind.Str()
      }
      (toKind(a), toKind(b)) match {
        // same-kind decimals: widen INTEGER-DIGIT capacity and scale
        // independently (round-13 review: max(p),max(s) SHRANK integer
        // capacity — DECIMAL(10,0) + DECIMAL(5,5) read as DECIMAL(10,5),
        // 5 integer digits, so a legal 9-digit value overflowed the
        // merged type). When the widened pair exceeds Spark's 38-digit
        // ceiling, SCALE yields, never integer capacity (ADVICE r13: the
        // earlier precision cap kept full scale, so DECIMAL(38,0) +
        // DECIMAL(10,10) merged to DECIMAL(38,10) and a 29+ digit value
        // that fit an INPUT type overflowed the merged type). Losing
        // scale rounds a fraction; losing integer digits nulls the whole
        // value under a CDC merge — rounding wins.
        case (Kind.Dec(p1, s1), Kind.Dec(p2, s2)) =>
          val intDigits = math.max(p1 - s1, p2 - s2)
          val scale = math.min(math.max(s1, s2), 38 - intDigits)
          DecimalType(intDigits + scale, scale)
        case (ka, kb) => Kind.merge(ka, kb).sparkType
      }
    }
  }

  /** Union two frames whose schemas may have diverged: the result carries
    * every column (first-appearance order), missing columns backfilled
    * with typed nulls and type conflicts resolved through the Kind
    * lattice — the batch analog of ADD COLUMN + NULL backfill.
    */
  def unionEvolve(a: DataFrame, b: DataFrame): DataFrame = {
    val bTypes = b.schema.fields.map(f => f.name -> f.dataType).toMap
    val fields = a.schema.fields.toSeq.map { f =>
      StructField(f.name, bTypes.get(f.name).map(resolveType(f.dataType, _)).getOrElse(f.dataType))
    } ++ b.schema.fields.toSeq.filterNot(f => a.schema.fieldNames.contains(f.name))
    def align(df: DataFrame) = df.select(fields.map { f =>
      if (df.schema.fieldNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    align(a).unionByName(align(b))
  }

  /** Destination-is-source-of-truth type reconciliation
    * (MergeColumnsFromDestination, table_data.go:317-381): in-memory
    * inferred kinds are overwritten by the destination's.
    */
  def mergeFromDestination(inMemory: StructType, destination: StructType): StructType = {
    val dst = destination.fields.map(f => f.name -> f).toMap
    StructType(inMemory.fields.map(f => dst.getOrElse(f.name, f)))
  }

  /** Column-drop confidence state machine (D3): a column may only be
    * dropped after staying absent for the full grace window, and never off
    * the back of a delete-only batch (table.go:130-162, constants.go:26).
    */
  case class DropCandidate(column: String, absentSince: Instant)

  object DropConfidence {
    /** Restore persisted candidate state (SURVEY §7.4: the grace window
      * must survive restarts or every restart resets the clock).
      */
    def load(path: java.nio.file.Path, graceHours: Long = 4): DropConfidence =
      if (java.nio.file.Files.exists(path))
        fromLines(java.nio.file.Files.readAllLines(path)
          .toArray(Array.empty[String]).toSeq, graceHours)
      else new DropConfidence(graceHours)

    /** Rehydrate from the sidecar's `col\tepochMilli` lines — the
      * filesystem-agnostic half of [[load]] (the emit sink persists the
      * same lines through hadoop FS so its workspace can live on any
      * scheme).
      */
    def fromLines(lines: Seq[String], graceHours: Long = 4): DropConfidence = {
      val dc = new DropConfidence(graceHours)
      lines.foreach { line =>
        line.split('\t') match {
          case Array(c, ts) => dc.candidates += (c -> Instant.ofEpochMilli(ts.toLong))
          case _ => ()
        }
      }
      dc
    }
  }

  class DropConfidence(graceHours: Long = 4) {
    private var candidates = Map.empty[String, Instant]

    /** Sidecar serialization, sorted for determinism. */
    def toLines: Seq[String] = candidates.toSeq.sortBy(_._1)
      .map { case (c, t) => s"$c\t${t.toEpochMilli}" }

    /** Persist candidate state to a sidecar file (tab-separated).
      * Write-temp-then-atomic-move: a torn sidecar could fabricate an
      * ancient absent-since timestamp and trigger a premature DROP.
      */
    def save(path: java.nio.file.Path): Unit = {
      // a bare filename has no parent (getParent == null) — createDirectories
      // would NPE; cwd-relative sidecars are legitimate
      Option(path.getParent).foreach(p => java.nio.file.Files.createDirectories(p))
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp, String.join("\n", toLines: _*).getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    /** Record one batch's observation; returns columns now safe to drop.
      * A delete-only batch contributes NO evidence in either direction —
      * delete events may carry only PKs, so its missing columns neither
      * start nor advance a clock, and (reference-faithful, ADVICE r12) a
      * column present in one does not purge a standing candidate either:
      * the reference's ShouldDeleteColumn never mutates columnsToDelete
      * when !containsOtherOperations (lib/destination/ddl table
      * lifecycle), and gating the purge the same way keeps a stream of
      * alternating hard-delete/absence batches from resetting the drop
      * clock forever. On batches WITH other operations, a present column
      * is positive schema evidence: its stale candidate is purged, so a
      * later absence starts a fresh window instead of inheriting the old
      * clock and dropping prematurely.
      */
    def observe(absentCols: Set[String], batchTime: Instant,
                containsOtherOperations: Boolean): Seq[String] = {
      if (!containsOtherOperations) return Nil // delete-only: no evidence either way
      candidates = candidates.filter { case (c, _) => absentCols.contains(c) }
      candidates ++= absentCols.filterNot(candidates.contains).map(_ -> batchTime)
      candidates.collect {
        case (c, since) if batchTime.isAfter(since.plusSeconds(graceHours * 3600)) => c
      }.toSeq.sorted
    }

    def reset(column: String): Unit = candidates -= column
    def pending: Map[String, Instant] = candidates
  }
}
