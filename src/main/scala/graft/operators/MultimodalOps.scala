package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media rides as
  * an opaque `binary` column + typed metadata struct; decode /
  * frame-sample / feature-extract are per-partition batch stages.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake pixel batches
  * from the bytes. Everything around it — the schema contract, the
  * id-partitioned batch shape, the Dataset encoders, the explode of frames
  * — is the real pipeline and is what a production codec would drop into.
  */
object MultimodalOps {
  /** Canonical media column schema: binary payload + typed metadata. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
  ))

  def packMedia(content: Column, mime: Column, width: Column, height: Column,
                durationMs: Column): Column =
    struct(mime.as("mime"), width.cast(IntegerType).as("width"),
      height.cast(IntegerType).as("height"), durationMs.cast(LongType).as("duration_ms"))

  case class Frame(media_id: Long, frame_idx: Int, width: Int, height: Int,
                   pixels: Array[Byte])

  /** The stubbed codec: a real implementation would hand `bytes` to an
    * image/video library here. The stub emits `nFrames` deterministic
    * 8x8 "frames" derived from a rolling hash of the payload, preserving
    * the batch shape (one media item -> N frame rows).
    */
  private[operators] def decodeStub(id: Long, bytes: Array[Byte], nFrames: Int): Seq[Frame] = {
    val side = 8
    (0 until nFrames).map { f =>
      val px = new Array[Byte](side * side)
      var acc = id * 31 + f
      var i = 0
      while (i < px.length) {
        val b = if (bytes.isEmpty) 0 else bytes(((acc % bytes.length) + bytes.length).toInt % bytes.length)
        acc = acc * 6364136223846793005L + b
        px(i) = (acc >>> 56).toByte
        i += 1
      }
      Frame(id, f, side, side, px)
    }
  }

  /** One analysis window of a decoded audio track: integer energy
    * (sum of absolute sample amplitudes) and peak amplitude.
    */
  case class AudioWindow(media_id: Long, window_idx: Int, energy: Long, peak: Int)

  /** The stubbed AUDIO codec: the PCM sibling of [[decodeStub]] — a real
    * implementation hands `bytes` to a decoder and yields signed sample
    * amplitudes; the stub derives a deterministic signed-byte stream
    * from the same rolling-hash scheme (distinct seed, so audio and
    * frame stubs never alias). Replayable by a SQL oracle, like every
    * stub in this module.
    */
  private[graft] def decodeAudioStub(id: Long, bytes: Array[Byte],
                                     nSamples: Int): Array[Int] = {
    val out = new Array[Int](nSamples)
    var acc = id * 131 + 7
    var i = 0
    while (i < nSamples) {
      val b = if (bytes.isEmpty) 0 else bytes(((acc % bytes.length) + bytes.length).toInt % bytes.length)
      acc = acc * 6364136223846793005L + b
      out(i) = (acc >>> 56).toByte.toInt // signed amplitude -128..127
      i += 1
    }
    out
  }

  /** Audio decode + windowed energy in ONE partition-local stage: decode
    * `nSamples` amplitudes per media item (stub codec; per-partition
    * init amortized like [[sampleFrames]]) and fold them into
    * `nSamples / win` analysis windows of (sum |amplitude|, max
    * |amplitude|) — the silence-detection / clipping-screen features an
    * audio curation pipeline filters on. Integer arithmetic end-to-end
    * and ZERO shuffle: windows are emitted directly by the decode map,
    * so the operator scales with input splits; only downstream per-media
    * aggregation (if any) shuffles, keyed on the media id.
    */
  def audioWindowEnergy(df: DataFrame, idCol: String, binCol: String,
                        nSamples: Int = 64, win: Int = 16): Dataset[AudioWindow] = {
    require(nSamples > 0 && win > 0 && nSamples % win == 0,
      s"need nSamples a positive multiple of win, got nSamples=$nSamples win=$win")
    val spark = df.sparkSession
    import spark.implicits._
    df.repartition(col(idCol))
      .select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.flatMap { case (id, bytes) =>
          val s = decodeAudioStub(id, bytes, nSamples)
          (0 until nSamples / win).map { w =>
            var e = 0L; var p = 0
            var j = w * win
            while (j < (w + 1) * win) {
              val a = math.abs(s(j)); e += a; if (a > p) p = a
              j += 1
            }
            AudioWindow(id, w, e, p)
          }
        }
      }
  }

  /** Frame-sample stage: (id, binary) -> Dataset[Frame]. Repartitions on
    * the media id so codec CPU fans out across executors, then runs the
    * decoder per partition — the shape a JNI/native codec needs (batch
    * init amortized per partition, not per row).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   framesPerItem: Int = 4): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.repartition(col(idCol))
      .select(col(idCol).cast(LongType), col(binCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.flatMap { case (id, bytes) => decodeStub(id, bytes, framesPerItem) }
      }
  }

  /** Resize stage: nearest-neighbor downscale/upscale of the pixel buffer
    * (grayscale byte-per-pixel). Deterministic integer index math — the
    * same partition-local typed map a native resizer (libvips/ffmpeg)
    * would slot into, with the Dataset/encoder plumbing unchanged.
    */
  def resizeFrames(frames: Dataset[Frame], outW: Int, outH: Int): Dataset[Frame] = {
    require(outW > 0 && outH > 0, s"resize target must be positive, got ${outW}x$outH")
    require(outW.toLong * outH <= Int.MaxValue,
      s"resize target ${outW}x$outH overflows the pixel buffer")
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { f =>
      val px = new Array[Byte](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = y * f.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * f.width / outW
          px(y * outW + x) = f.pixels(sy * f.width + sx)
          x += 1
        }
        y += 1
      }
      Frame(f.media_id, f.frame_idx, outW, outH, px)
    }
  }

  /** Per-media activity envelope: flag low-energy (dark/silent) frames by
    * integer mean luma (sum < threshold * n_px — no float mean), then
    * report the trim bounds: first/last active frame index and the
    * low-frame count per media (NULL bounds = the whole item is
    * low-energy, the "drop this asset" signal). The energy fold is the
    * same partition-local typed map the codec slot uses; the aggregation
    * is one media-keyed shuffle of frame-count-sized rows — at 100 TB the
    * pixel buffers never leave the map side.
    */
  def frameActivityBounds(frames: Dataset[Frame], lumaThreshold: Int): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .map(f => (f.media_id, f.frame_idx,
        f.pixels.foldLeft(0L)((a, b) => a + (b & 0xFF)), f.pixels.length))
      .toDF("media_id", "frame_idx", "luma_sum", "n_px")
      .withColumn("low", col("luma_sum") < lit(lumaThreshold.toLong) * col("n_px"))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("low").cast(LongType)).as("n_low"),
        min(when(!col("low"), col("frame_idx"))).cast(LongType).as("first_active"),
        max(when(!col("low"), col("frame_idx"))).cast(LongType).as("last_active"))
  }

  /** 64-bit average perceptual hash (aHash) per frame: bit i is set iff
    * pixel i is STRICTLY above the frame mean — compared in integers
    * (px*n > sum), so the hash is exact with no float mean. Frames wider
    * than 64 pixels hash their first 64 (run [[resizeFrames]] to 8x8
    * first — the stub codec already emits 8x8). Near-identical frames
    * (small pixel perturbations, re-encode noise) land within a few bits
    * of Hamming distance, so the pairs machinery
    * ([[DedupOps.hammingPairs64]], exact recall for d <= 3) turns this
    * into image/frame near-dup detection — the visual counterpart of
    * SimHash for text. Map-only typed pass, same codec-slot shape as
    * [[frameFeatures]].
    */
  def frameAHash(frames: Dataset[Frame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { f =>
      var sum = 0L
      f.pixels.foreach(b => sum += (b & 0xFF))
      val n = f.pixels.length
      var h = 0L
      var i = 0
      val m = math.min(n, 64)
      while (i < m) {
        if ((f.pixels(i) & 0xFF).toLong * n > sum) h |= (1L << i)
        i += 1
      }
      (f.media_id, f.frame_idx, h)
    }.toDF("media_id", "frame_idx", "ahash")
  }

  /** Deterministic single-pixel perturbation with an id shift — the test
    * double for a re-encoded/slightly-corrupted copy of the same media
    * (the real slot would be a decode->re-encode round trip). Used to
    * exercise the perceptual-hash near-dup path with pairs at small
    * nonzero Hamming distance.
    */
  def perturbPixel(frames: Dataset[Frame], pos: Int, value: Byte,
                   idOffset: Long): Dataset[Frame] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { f =>
      val px = f.pixels.clone()
      if (pos < px.length) px(pos) = value
      Frame(f.media_id + idOffset, f.frame_idx, f.width, f.height, px)
    }
  }

  case class FrameFeatures(media_id: Long, frame_idx: Int, mean_px: Double,
                           min_px: Int, max_px: Int)

  /** Feature-extract stage over decoded frames. Pixel buffers are binary
    * (no higher-order functions apply), so features come from a typed map
    * in the same partition-local pass a real extractor would use.
    */
  def frameFeatures(frames: Dataset[Frame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { f =>
      var sum = 0L; var mn = 255; var mx = 0
      f.pixels.foreach { b =>
        val u = b & 0xFF
        sum += u; if (u < mn) mn = u; if (u > mx) mx = u
      }
      val n = math.max(f.pixels.length, 1)
      FrameFeatures(f.media_id, f.frame_idx, sum.toDouble / n, mn min mx, mx)
    }.toDF()
  }

  /** Constellation landmarks over a per-media peak series (Wang 2003,
    * the Shazam scheme): each peak pairs with every peak up to `maxDt`
    * steps ahead in the SAME media, and the pair packs into one integer
    * hash ((a1·aCard + a2)·(maxDt+1) + dt) — the key of the fingerprint
    * inverted index. Input columns: `idCol`, `tCol` (peak time step),
    * `aCol` (quantized peak magnitude, 0..aCard-1). Output:
    * (hash, `idCol`, t) with t = the anchor peak's time.
    *
    * Scale shape: an equi-self-join on the media id whose per-key output
    * is windows·maxDt — bounded per media by construction (peaks are one
    * per analysis window), never corpus². The hash relation then
    * IS the shuffly thing downstream matching keys on.
    */
  def constellationLandmarks(peaks: DataFrame, idCol: String, tCol: String,
                             aCol: String, maxDt: Int,
                             aCard: Long = 129L): DataFrame = {
    require(maxDt >= 1, s"need maxDt >= 1, got $maxDt")
    val p = peaks.select(col(idCol).cast(LongType).as("__id"),
      col(tCol).cast(LongType).as("__t"), col(aCol).cast(LongType).as("__a"))
    p.as("p1").join(p.as("p2"),
        col("p1.__id") === col("p2.__id") &&
          col("p2.__t") > col("p1.__t") &&
          col("p2.__t") <= col("p1.__t") + maxDt)
      .select(
        ((col("p1.__a") * aCard + col("p2.__a")) * (maxDt + 1L) +
          (col("p2.__t") - col("p1.__t"))).as("hash"),
        col("p1.__id").as(idCol), col("p1.__t").as("t"))
  }

  /** Fingerprint matching: probe snippet landmarks against the track
    * landmark index on the packed hash, vote on the implied alignment
    * offset (track anchor t − snippet anchor t), and return each
    * snippet's best (track, offset) by votes — ties to the smallest
    * offset, then smallest track id. A true containment match
    * concentrates votes on ONE offset; random hash collisions scatter —
    * that concentration is the whole trick.
    *
    * Scale shape: one equi-join on the hash (the inverted-index probe;
    * snippet side is small by nature), one aggregation keyed on
    * (snippet, track, offset), and a snippet-partitioned window for the
    * argmax. No cross join, no driver state.
    */
  def constellationMatch(trackLm: DataFrame, snipLm: DataFrame,
                         trackIdCol: String, snipIdCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(snipIdCol))
      .orderBy(col("votes").desc, col("offset_w"), col(trackIdCol))
    snipLm.select(col("hash"), col(snipIdCol), col("t").as("__ts"))
      .join(trackLm.select(col("hash"), col(trackIdCol), col("t").as("__tt")),
        Seq("hash"))
      .groupBy(col(snipIdCol), col(trackIdCol),
        (col("__tt") - col("__ts")).as("offset_w"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Voice-activity segmentation over the windowed energy profile: a
    * window is ACTIVE when its energy clears `thrEnergy`; consecutive
    * active windows merge into segments (gaps-and-islands on
    * window_idx − row_number, all inside the per-media partition) and
    * segments shorter than `minWindows` are dropped as clicks — the
    * standard energy-gate VAD an audio curation pipeline runs before
    * paying for transcription. Decode reuses [[audioWindowEnergy]]'s
    * partition-local stub stage; everything after is declarative column
    * algebra, no shuffle beyond the media-id partitioning the decode
    * already established.
    *
    * Output per segment: media_id, seg_idx (0-based in time order),
    * start_win, end_win (inclusive), n_windows, sum_energy.
    */
  def voiceActivitySegments(df: DataFrame, idCol: String, binCol: String,
                            nSamples: Int, win: Int, thrEnergy: Long,
                            minWindows: Int): DataFrame = {
    require(minWindows >= 1, s"need minWindows >= 1, got $minWindows")
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("window_idx"))
    val active = audioWindowEnergy(df, idCol, binCol, nSamples, win).toDF()
      .filter(col("energy") >= thrEnergy)
      .withColumn("__grp",
        col("window_idx") - row_number().over(wm))
    val segs = active.groupBy(col("media_id"), col("__grp"))
      .agg(min(col("window_idx")).as("start_win"),
        max(col("window_idx")).as("end_win"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("sum_energy"))
      .filter(col("n_windows") >= minWindows.toLong)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("start_win"))
    segs.withColumn("seg_idx", row_number().over(ws).cast(LongType) - 1L)
      .select(col("media_id"), col("seg_idx"), col("start_win"),
        col("end_win"), col("n_windows"), col("sum_energy"))
  }
}
