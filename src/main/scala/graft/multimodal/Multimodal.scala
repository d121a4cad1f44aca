package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing (SURVEY §2.4): media as opaque `binary`
  * payloads with a typed metadata struct, plus a batched decode /
  * feature-extract stage.
  *
  * Decoding is pluggable ([[MediaCodec]]): [[ImageIOCodec]] is a REAL
  * image decoder (JDK `javax.imageio` — PNG/BMP/GIF, no external deps)
  * producing luminance pixels; [[StubCodec]] is the deterministic
  * byte-arithmetic fake the DuckDB oracle replays (no image libs on the
  * oracle side). Both run through the SAME mapPartitions batch path —
  * schema, partitioning and batch shape don't depend on the codec.
  */
object Multimodal {

  /** Per-partition-amortizable decoder: payload bytes → pixel bytes.
    * Implementations must be cheap to ship in a task closure. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], mime: String,
               width: Int, height: Int): Array[Byte]
  }

  /** Deterministic fake standing in for a codec: "decodes" by tiling
    * payload bytes to width·height (capped) — see [[featureQuerySql]],
    * which replays exactly this byte math. */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte], mime: String,
               width: Int, height: Int): Array[Byte] = {
      val n = math.min(width * height, 4096)
      if (payload.isEmpty) Array.emptyByteArray
      else Array.tabulate(n)(i => payload(i % payload.length))
    }
  }

  /** Real decoder over the JDK's `javax.imageio` (PNG / BMP / GIF /
    * JPEG where the JDK ships it): decodes the payload and emits
    * row-major integer luminance ((299·R + 587·G + 114·B) / 1000 —
    * integer math, so the spec can recompute it exactly). Undecodable
    * payloads yield an empty pixel array rather than failing the batch —
    * at corpus scale a handful of corrupt blobs must not kill a stage. */
  object ImageIOCodec extends MediaCodec {
    def decode(payload: Array[Byte], mime: String,
               width: Int, height: Int): Array[Byte] =
      // NonFatal, not just IOException: the JDK readers throw
      // IllegalArgumentException / ArrayIndexOutOfBounds on malformed
      // chunk data, and those must degrade to empty too
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) Array.emptyByteArray
        else {
          val w = img.getWidth; val h = img.getHeight
          if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) Array.emptyByteArray
          else {
            val out = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                  (rgb & 0xFF) * 114) / 1000
                out(y * w + x) = lum.toByte
                x += 1
              }
              y += 1
            }
            out
          }
        }
      } catch { case scala.util.control.NonFatal(_) => Array.emptyByteArray }
  }

  /** A media row: payload + metadata, as a training pipeline would store it
    * in parquet (payload column stays opaque/prunable). */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      width: Int, height: Int, n_bytes: Long)

  case class MediaFeature(doc_id: Long, n_bytes: Long, mean_byte: Double,
                          feature: Array[Float])

  /** Assemble a media table from `documents` (text bytes stand in for
    * image payloads; dims derived deterministically). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("mime"),
      (lit(64) + col("doc_id") % 64).cast("int").as("width"),
      (lit(64) + col("doc_id") % 48).cast("int").as("height"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Batched decode + feature extraction via mapPartitions — the Scala
    * analogue of a pandas-batch UDF: one iterator per partition so the
    * codec amortizes its init across the batch. The codec is a parameter:
    * [[StubCodec]] (default — oracle-replayable byte math) and
    * [[ImageIOCodec]] (real `javax.imageio` decode, spec-checked on
    * generated PNG/BMP images) run the identical plan. */
  def extractFeatures(media: DataFrame,
                      codec: MediaCodec = StubCodec): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "width", "height", "n_bytes")
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { m =>
          val px = codec.decode(m.payload, m.mime, m.width, m.height)
          // Long accumulator: an Int sum wraps past ~16M pixels (real
          // ImageIOCodec images are unbounded; only the stub caps at 4096)
          MediaFeature(m.doc_id, m.n_bytes,
            if (px.isEmpty) 0.0
            else px.foldLeft(0L)((a, b) => a + (b & 0xFF)).toDouble / px.length,
            Array.tabulate(8)(i => if (i < px.length) (px(i) & 0xFF).toFloat else 0f))
        }
      }
  }

  /** Metadata projection — reads only pruned columns, never the payload
    * (verify with .explain: ReadSchema excludes `text` bytes beyond the
    * encode). Oracle-checked as `m_multimodal_meta`. */
  def metaQuery(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("n_bytes"), md5(col("payload")).as("fp"))
      .orderBy(col("doc_id"))

  val metaQuerySql: String = """
    SELECT doc_id, 'image/fake' AS mime,
           CAST(64 + doc_id % 64 AS int) AS width,
           CAST(64 + doc_id % 48 AS int) AS height,
           CAST(octet_length(encode(text)) AS bigint) AS n_bytes,
           md5(text) AS fp
    FROM documents
    ORDER BY doc_id"""

  /** DuckDB re-derivation of the stub decode's byte math (hex-pair bytes,
    * tiled to n = min(w·h, 4096)) — even the mapPartitions path is
    * oracle-checked because the fake codec is deterministic byte
    * arithmetic. */
  val featureQuerySql: String = """
    WITH m AS (
      SELECT doc_id, encode(text) AS payload,
             LEAST((64 + doc_id % 64) * (64 + doc_id % 48), 4096) AS n
      FROM documents
    ), b AS (
      SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS len, n FROM m
    )
    SELECT doc_id, CAST(len AS bigint) AS n_bytes,
           CAST(floor((CAST(list_reduce(list_transform(range(0, n),
                  i -> CAST('0x' || substr(hx, ((i % len) * 2) + 1, 2) AS BIGINT)),
                  (x, y) -> x + y) AS double) / n) * 100.0) AS bigint) AS mean_byte_c
    FROM b
    ORDER BY doc_id"""

  /** Feature extraction through the stubbed codec (mapPartitions batch
    * path; output oracle-checked via [[featureQuerySql]]). */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    extractFeatures(mediaTable(spark, sfDir))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), floor(col("mean_byte") * 100).cast("long").as("mean_byte_c"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: treat the payload as fixed-size 16-byte "frames" and
    * keep every 4th frame, at most 8 per doc — the video-pipeline shape
    * (decode only sampled frames, never the whole clip). All columnar:
    * sequence + explode is a per-row map, the binary slice stays inside
    * codegen, and the payload column is read once. Frame fingerprint =
    * upper-hex of the slice (deterministic → oracle-checked). */
  def frameSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"), col("n_bytes"),
        explode(sequence(lit(0), lit(7))).as("frame_no"))
      .withColumn("start", col("frame_no") * 64)
      .filter(col("start") + 16 <= col("n_bytes"))
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        hex(expr("substring(payload, cast(start + 1 as int), 16)")).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_no"))

  val frameSampleSql: String = """
    SELECT doc_id, frame_no, substr(hx, start * 2 + 1, 32) AS frame_hex
    FROM (
      SELECT doc_id, unnest(range(0, 8)) AS frame_no,
             unnest(range(0, 8)) * 64 AS start,
             hex(encode(text)) AS hx, octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    WHERE start + 16 <= n_bytes
    ORDER BY doc_id, frame_no"""

  /** Audio-side codec: payload bytes → signed 16-bit little-endian PCM
    * amplitudes. The stub IS the production wire format for raw PCM, so
    * unlike the image stub nothing is faked — only the sample rate is
    * notional. A real compressed-audio decoder would slot in exactly like
    * [[ImageIOCodec]] does for images. */
  trait AudioCodec extends Serializable {
    def decode(payload: Array[Byte]): Array[Int]
  }

  object PcmCodec extends AudioCodec {
    def decode(payload: Array[Byte]): Array[Int] =
      Array.tabulate(payload.length / 2) { i =>
        (payload(2 * i + 1) << 8) | (payload(2 * i) & 0xFF) // sign from the high byte
      }
  }

  case class AudioFeature(doc_id: Long, n_frames: Long, peak_frame: Long,
                          peak_amp_m: Long, mean_amp_m: Long)

  /** Frame-energy extraction: 64-sample frames (complete frames only),
    * per-frame mean |amplitude| (integer div), per-doc peak frame
    * (ties → lowest index) and overall mean — the VAD/segmentation
    * pre-pass an audio training pipeline runs before transcription.
    * Same mapPartitions batch posture as [[extractFeatures]]; the byte
    * math is deterministic, so the DuckDB oracle replays the full
    * decode from hex pairs ([[audioEnergySql]]). */
  def extractAudioFeatures(media: DataFrame,
                           codec: AudioCodec = PcmCodec): Dataset[AudioFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "mime", "width", "height", "n_bytes")
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { m =>
          val samples = codec.decode(m.payload)
          val nFrames = samples.length / 64
          if (nFrames == 0) None
          else {
            var peakFrame = 0L; var peakAmp = -1L; var total = 0L
            var f = 0
            while (f < nFrames) {
              var s = 0L; var i = f * 64
              while (i < (f + 1) * 64) { s += math.abs(samples(i)); i += 1 }
              total += s
              val ampM = s / 64
              if (ampM > peakAmp) { peakAmp = ampM; peakFrame = f }
              f += 1
            }
            Some(AudioFeature(m.doc_id, nFrames, peakFrame, peakAmp,
              total / (nFrames * 64L)))
          }
        }
      }
  }

  /** [[extractAudioFeatures]] over the media table (payload bytes as raw
    * PCM), oracle-checked via [[audioEnergySql]]. */
  def audioEnergyQuery(spark: SparkSession, sfDir: String): DataFrame =
    extractAudioFeatures(mediaTable(spark, sfDir))
      .toDF()
      .orderBy(col("doc_id"))

  val audioEnergySql: String = """
    WITH m AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
      WHERE octet_length(encode(text)) >= 128
    ), s AS (
      SELECT doc_id, i // 64 AS frame,
             abs((CASE WHEN hb >= 128 THEN hb - 256 ELSE hb END) * 256 + lb) AS amp
      FROM (
        SELECT doc_id, unnest(range(0, (len // 128) * 64)) AS i, hx FROM m
      ) t,
      LATERAL (SELECT CAST('0x' || substr(hx, CAST(i * 4 + 3 AS int), 2) AS BIGINT) AS hb,
                      CAST('0x' || substr(hx, CAST(i * 4 + 1 AS int), 2) AS BIGINT) AS lb)
    ), f AS (
      SELECT doc_id, frame, CAST(sum(amp) // 64 AS bigint) AS amp_m,
             CAST(sum(amp) AS bigint) AS amp_sum
      FROM s GROUP BY doc_id, frame
    )
    SELECT doc_id, CAST(count(*) AS bigint) AS n_frames,
           CAST(min(CASE WHEN rnk = 1 THEN frame END) AS bigint) AS peak_frame,
           CAST(min(CASE WHEN rnk = 1 THEN amp_m END) AS bigint) AS peak_amp_m,
           CAST(sum(amp_sum) // (count(*) * 64) AS bigint) AS mean_amp_m
    FROM (
      SELECT doc_id, frame, amp_m, amp_sum,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY amp_m DESC, frame) AS rnk
      FROM f
    )
    GROUP BY doc_id
    ORDER BY doc_id"""

  /** 64-bit average-hash (aHash) of a decoded pixel array — the classic
    * perceptual image fingerprint (LAION-style image dedup): split the
    * pixels into 64 equal blocks, bit j = 1 iff block j's mean luminance
    * exceeds the global mean. Integer-exact comparison (s·n > total·bs —
    * no float division), emitted as a 64-char bit string so the DuckDB
    * oracle can rebuild it from the stub codec's byte math. Pixels that
    * don't fill 64 blocks (empty/corrupt decode) hash to "" and form
    * their own bucket. */
  def aHashOf(px: Array[Byte]): String =
    if (px.length < 64) "" else {
      val n = px.length
      val bs = n / 64
      var total = 0L
      var i = 0
      while (i < n) { total += (px(i) & 0xFF); i += 1 }
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < 64) {
        var s = 0L
        var k = j * bs
        while (k < (j + 1) * bs) { s += (px(k) & 0xFF); k += 1 }
        // block mean > global mean ⇔ s/bs > total/n ⇔ s·n > total·bs
        sb.append(if (s * n > total * bs) '1' else '0')
        j += 1
      }
      sb.toString
    }

  private case class MediaHash(doc_id: Long, ahash: String)

  /** Perceptual-hash image dedup — decode through the pluggable codec
    * (same mapPartitions batch path as [[extractFeatures]]), fingerprint
    * with [[aHashOf]], then bucket on the hash: identical aHash = visual
    * near-duplicate (robust to brightness scaling and byte-level noise
    * that defeats the md5 in [[metaQuery]]). Scale shape: the decode is
    * per-row map work, the dedup is ONE shuffle on the 64-bit hash with
    * a min-id window — exactly [[graft.queries.TextQueries.dedupExact]]
    * over a perceptual key instead of an exact one. Oracle replays the
    * stub codec's tiled-byte pixels and the block arithmetic
    * bit-for-bit. */
  def phashDedupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = mediaTable(spark, sfDir)
      .select("doc_id", "payload", "mime", "width", "height", "n_bytes")
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map(m => MediaHash(m.doc_id,
          aHashOf(StubCodec.decode(m.payload, m.mime, m.width, m.height))))
      }
    val byKey = Window.partitionBy(col("ahash"))
    hashed.toDF()
      .withColumn("canonical_id", min(col("doc_id")).over(byKey))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[phashDedupQuery]] over the stub codec: pixels =
    * payload bytes tiled to min(w·h, 4096) (= 4096 here since w,h ≥ 64),
    * then the identical 64-block integer aHash. */
  val phashDedupSql: String = """
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS len
      FROM documents
    ), px AS (
      SELECT doc_id, list_transform(range(0, 4096),
               i -> CAST('0x' || substr(hx, ((i % len) * 2) + 1, 2) AS BIGINT)) AS p
      FROM b
    ), hs AS (
      SELECT doc_id,
             list_reduce(p, (x, y) -> x + y) AS total,
             list_transform(range(0, 64), j ->
               list_reduce(list_transform(range(0, 64), i -> p[j * 64 + i + 1]),
                           (x, y) -> x + y)) AS bsums
      FROM px
    ), ah AS (
      SELECT doc_id,
             list_reduce(list_transform(range(0, 64), j ->
               CASE WHEN bsums[j + 1] * 4096 > total * 64 THEN '1' ELSE '0' END),
               (x, y) -> x || y) AS ahash
      FROM hs
    )
    SELECT doc_id, ahash,
           min(doc_id) OVER (PARTITION BY ahash) AS canonical_id,
           CAST(doc_id <> min(doc_id) OVER (PARTITION BY ahash) AS int) AS is_dup
    FROM ah
    ORDER BY doc_id"""

  /** Frame-level dedup across documents — the video-pipeline counterpart
    * of segment-level text dedup: keep only the globally-first occurrence
    * of each distinct sampled frame (ordered by doc, then frame position).
    * Same scale shape as [[graft.operators.Dedup.segmentDedup]]: one
    * groupBy(frame fingerprint) min over a (doc, frame) struct — map-side
    * combinable, linear in occurrences of a hot frame, never f² — plus an
    * equi-join back to mark occurrences. */
  def frameDedupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val f = frameSampleQuery(spark, sfDir)
      .select(col("doc_id"), col("frame_no"), col("frame_hex"))
    val keeper = f.groupBy(col("frame_hex"))
      .agg(min(struct(col("doc_id").as("d"), col("frame_no").as("f"))).as("kp"),
           count(lit(1)).as("n_occ"))
    f.join(keeper, Seq("frame_hex"))
      .select(col("doc_id"), col("frame_no"), col("frame_hex"), col("n_occ"),
        (col("doc_id") === col("kp.d") && col("frame_no") === col("kp.f")).cast("int").as("kept"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  val frameDedupSql: String = s"""
    WITH f AS ($frameSampleSql),
    k AS (
      SELECT frame_hex, min({'d': doc_id, 'f': frame_no}) AS kp,
             count(*) AS n_occ
      FROM f GROUP BY frame_hex
    )
    SELECT doc_id, frame_no, frame_hex, CAST(n_occ AS bigint) AS n_occ,
           CAST(doc_id = kp.d AND frame_no = kp.f AS int) AS kept
    FROM f JOIN k USING (frame_hex)
    ORDER BY doc_id, frame_no"""

  /** Scene-cut detection over the sampled frame sequence — the shot-
    * boundary pass a video pipeline runs before per-shot sampling
    * (consecutive-frame feature delta above a threshold = a cut). Frame
    * "energy" here is the byte-sum of the 16-byte stub frame (the
    * deterministic stand-in the real codec path swaps for a histogram/
    * embedding delta — the plan is identical either way): per doc, a lag
    * window over frame_no scores |eₜ − eₜ₋₁|, and the report is per-doc
    * cut counts + the largest delta. Windows partition by doc (bounded
    * frame count); one shuffle. */
  def sceneCutsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cut = 300L
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    frameSampleQuery(spark, sfDir)
      .withColumn("energy", expr(
        "aggregate(transform(sequence(0, 15), i -> conv(substr(frame_hex, i*2+1, 2), 16, 10)), " +
          "0L, (a, x) -> a + cast(x as long))"))
      .withColumn("delta", abs(col("energy") - lag(col("energy"), 1).over(w)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > cut, 1L).otherwise(0L)).as("n_cuts"),
        max(coalesce(col("delta"), lit(0L))).as("max_delta"))
      .orderBy(col("doc_id"))
  }

  val sceneCutsSql: String = s"""
    WITH f AS ($frameSampleSql),
    e AS (
      SELECT doc_id, frame_no,
             CAST(list_sum(list_transform(range(0, 16),
               i -> CAST('0x' || substr(frame_hex, CAST(i*2+1 AS int), 2) AS BIGINT))) AS bigint) AS energy
      FROM f
    ), d AS (
      SELECT doc_id,
             abs(energy - lag(energy, 1) OVER (PARTITION BY doc_id ORDER BY frame_no)) AS delta
      FROM e
    )
    SELECT doc_id, CAST(count(*) AS bigint) AS n_frames,
           CAST(sum(CASE WHEN delta > 300 THEN 1 ELSE 0 END) AS bigint) AS n_cuts,
           CAST(max(coalesce(delta, 0)) AS bigint) AS max_delta
    FROM d
    GROUP BY doc_id
    ORDER BY doc_id"""
}
