package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed in partition-batches.
  *
  * Design (the part that must be real at 100 TB):
  * - payloads travel as `BinaryType` next to a small metadata struct —
  *   filters/joins touch only metadata columns, so Parquet column pruning
  *   keeps the heavy bytes unread until a decode stage actually needs them;
  * - decode/feature-extract runs via `mapPartitions` over a typed Dataset —
  *   the JVM analog of pandas-UDF `mapInPandas`: batch-shaped, no
  *   per-row UDF dispatch, arbitrary native libs loadable per partition;
  * - IMAGES decode for real through pure-JDK `javax.imageio` (PNG/JPEG/
  *   GIF/BMP — the readers the JDK ships; zero native deps): width,
  *   height, 16-bin luminance histogram. AUDIO decodes for real through
  *   pure-JDK `javax.sound.sampled` (WAV/AIFF/AU): sample rate, duration,
  *   16-bin amplitude histogram over signed-16-bit PCM. Payloads the JDK
  *   can't read — MP3/OGG, all of video — fall back to the deterministic
  *   byte-histogram stub (`decodeStub`), flagged `decoded = false`; swap
  *   in a JNI/FFM codec binding there in production. The batch shape,
  *   schema, and pruning are identical on every path.
  */
object Multimodal {

  final case class MediaMeta(modality: String, width: Int, height: Int,
                             sampleRateHz: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, modality: String,
                                 byte_len: Long, sha: String,
                                 decoded: Boolean, width: Int, height: Int,
                                 sample_rate_hz: Int, duration_ms: Long,
                                 features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("sampleRateHz", IntegerType),
      StructField("durationMs", LongType))), nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** STUB decode: deterministic 16-bin byte histogram, L1-normalized — a
    * stand-in with the exact shape of a real feature extractor
    * (fixed-length Array[Float] per payload). Replace with a codec binding;
    * the signature and batch shape stay. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    if (payload != null && payload.nonEmpty) {
      payload.foreach(b => bins((b & 0xFF) / 16) += 1f)
      val n = payload.length.toFloat
      var i = 0
      while (i < 16) { bins(i) /= n; i += 1 }
    }
    bins
  }

  /** REAL image decode, pure JDK: parse the payload with `javax.imageio`
    * and produce (width, height, 16-bin L1-normalized luminance
    * histogram). Luminance is the integer Rec. 601 weighting
    * (299R + 587G + 114B)/1000 — deterministic across platforms. Returns
    * None when no installed reader recognizes the bytes (corrupt payload,
    * or a format the JDK doesn't ship, e.g. WEBP) — callers fall back to
    * the stub rather than failing the partition. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val bins = new Array[Float](16)
    // row-at-a-time bulk getRGB: one array copy per row, not a method
    // call per pixel (the difference between a decode stage that keeps
    // up with the scan and one that doesn't)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        bins(lum >> 4) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    var i = 0
    while (i < 16) { bins(i) /= n; i += 1 }
    Some((w, h, bins))
  }

  /** REAL audio decode, pure JDK: parse the payload with
    * `javax.sound.sampled` (WAV/AIFF/AU — the readers the JDK ships),
    * normalize to signed-16-bit PCM if the container isn't already, and
    * produce (sampleRateHz, durationMs, 16-bin L1-normalized |amplitude|
    * histogram — bin = |sample| >> 11). Returns None when no installed
    * reader recognizes the bytes (MP3/OGG need codecs the JDK doesn't
    * ship) — callers fall back to the stub rather than failing the
    * partition. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Long, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais0 =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (ais0 == null) return None
    // the converted stream may hold provider resources of its own — close
    // it too (when it differs from ais0), not just the source stream
    var ais: javax.sound.sampled.AudioInputStream = ais0
    try {
      val f0 = ais0.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, 2 * f0.getChannels,
        f0.getSampleRate, false)
      if (!(f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            f0.getSampleSizeInBits == 16 && !f0.isBigEndian))
        ais = AudioSystem.getAudioInputStream(target, ais0)
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      if (n == 0) return None
      val bins = new Array[Float](16)
      var i = 0
      while (i < n) {
        val s = ((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xFF)).toShort.toInt
        // |−32768| would index bin 16 — clamp to the top bin
        bins(math.min(math.abs(s), 32767) >> 11) += 1f
        i += 1
      }
      var j = 0
      while (j < 16) { bins(j) /= n; j += 1 }
      val frames = n / math.max(1, f0.getChannels)
      val durationMs = frames * 1000L / math.max(1L, f0.getSampleRate.toLong)
      Some((f0.getSampleRate.toInt, durationMs, bins))
    } catch { case _: Exception => None }
    finally {
      if (!(ais eq ais0)) try ais.close() catch { case _: Exception => }
      ais0.close()
    }
  }

  /** MPEG-audio (MP3) frame-header metadata parse — pure JVM, no codec.
    * The JDK ships no MP3 decoder and this environment admits no native
    * binding, so PCM synthesis is out of scope; but the container's frame
    * headers are a published 4-byte format (ISO/IEC 11172-3), so the
    * METADATA a pipeline filters on — sample rate, duration — is
    * recoverable exactly by walking frames: skip an ID3v2 tag if present
    * (syncsafe size), then require consecutive sync-valid headers with a
    * consistent sample rate, summing samples-per-frame/sample-rate across
    * frames (VBR-correct: each frame's own bitrate sizes the hop to the
    * next header; a Xing/VBRI estimate would be a guess, the walk is the
    * ground truth). Returns None unless >= 2 consecutive valid frames
    * parse — a random payload that happens to contain 0xFFEx once does
    * not produce fabricated metadata. */
  def parseMp3Meta(payload: Array[Byte]): Option[(Int, Long)] = {
    if (payload == null || payload.length < 4) return None
    var off = 0
    // ID3v2 header: "ID3" vM.m flags size(4 x 7-bit syncsafe). The size
    // field excludes the 10-byte header AND the optional 10-byte footer
    // (ID3v2.4 §3.1: flags bit 0x10 = footer present) — without the
    // footer skip, off lands 10 bytes short of the first frame, the sync
    // check fails, and real metadata is silently missed.
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val sz = ((payload(6) & 0x7F) << 21) | ((payload(7) & 0x7F) << 14) |
        ((payload(8) & 0x7F) << 7) | (payload(9) & 0x7F)
      off = 10 + sz + (if ((payload(5) & 0x10) != 0) 10 else 0)
      // Tolerate a short run of zero padding between tag and first frame
      // (writers pad for in-place tag growth). Zero bytes can never start
      // a frame header (sync is 0xFF), so skipping them fabricates
      // nothing; the bound keeps a zero-filled payload from scanning far.
      val padEnd = math.min(payload.length, off + 4096)
      while (off < padEnd && payload(off) == 0) off += 1
    }
    val srTab = Map(3 -> Array(44100, 48000, 32000),  // MPEG1
                    2 -> Array(22050, 24000, 16000),  // MPEG2
                    0 -> Array(11025, 12000, 8000))   // MPEG2.5
    val brV1 = Map( // kbps by layer, MPEG1 (index 1..14; 0=free, 15=bad)
      3 -> Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      2 -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      1 -> Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    val brV2 = Map( // MPEG2 / 2.5
      3 -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      2 -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      1 -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
    var frames = 0
    var sampleRate = 0
    var durationUs = 0L
    while (off + 4 <= payload.length) {
      val b1 = payload(off) & 0xFF; val b2 = payload(off + 1) & 0xFF
      val b3 = payload(off + 2) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) {
        return if (frames >= 2) Some((sampleRate, durationUs / 1000L)) else None
      }
      val ver = (b2 >> 3) & 3      // 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
      val layer = (b2 >> 1) & 3    // 3=I 2=II 1=III 0=reserved
      val brIdx = (b3 >> 4) & 0xF
      val srIdx = (b3 >> 2) & 3
      val pad = (b3 >> 1) & 1
      if (ver == 1 || layer == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        return if (frames >= 2) Some((sampleRate, durationUs / 1000L)) else None
      val sr = srTab(ver)(srIdx)
      if (sampleRate != 0 && sr != sampleRate)
        return if (frames >= 2) Some((sampleRate, durationUs / 1000L)) else None
      val br = (if (ver == 3) brV1 else brV2)(layer)(brIdx) * 1000
      val (frameLen, samples) = layer match {
        case 3 => ((12 * br / sr + pad) * 4, 384)                    // Layer I
        case 2 => (144 * br / sr + pad, 1152)                        // Layer II
        case _ =>                                                    // Layer III
          if (ver == 3) (144 * br / sr + pad, 1152)
          else (72 * br / sr + pad, 576)
      }
      if (frameLen <= 4) return None
      sampleRate = sr
      frames += 1
      durationUs += samples.toLong * 1000000L / sr
      off += frameLen
    }
    if (frames >= 2) Some((sampleRate, durationUs / 1000L)) else None
  }

  /** Batch feature extraction: one pass per partition, payload pruned from
    * the output (features are narrow; never carry bytes forward). Image
    * payloads go through the real imageio decoder, audio through the real
    * javax.sound decoder; MP3 payloads the JDK can't decode still get REAL
    * metadata (sample rate + duration from [[parseMp3Meta]]'s frame walk)
    * with stub features; everything else (and unreadable payloads) takes
    * the stub with `decoded = false` and metadata passed through. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { row =>
        val bytes = Option(row.payload).getOrElse(Array.emptyByteArray)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        def stub = MediaFeatures(row.media_id, row.meta.modality,
          bytes.length.toLong, sha, decoded = false,
          row.meta.width, row.meta.height,
          row.meta.sampleRateHz, row.meta.durationMs, decodeStub(bytes))
        row.meta.modality match {
          case "image" => decodeImage(bytes) match {
            case Some((w, h, hist)) =>
              MediaFeatures(row.media_id, row.meta.modality,
                bytes.length.toLong, sha, decoded = true, w, h,
                row.meta.sampleRateHz, row.meta.durationMs, hist)
            case None => stub
          }
          case "audio" => decodeAudio(bytes) match {
            case Some((sr, durMs, hist)) =>
              MediaFeatures(row.media_id, row.meta.modality,
                bytes.length.toLong, sha, decoded = true,
                row.meta.width, row.meta.height, sr, durMs, hist)
            case None => parseMp3Meta(bytes) match {
              // PCM stays undecoded (decoded = false, stub features) but
              // the filterable metadata is real, from the frame walk
              case Some((sr, durMs)) =>
                MediaFeatures(row.media_id, row.meta.modality,
                  bytes.length.toLong, sha, decoded = false,
                  row.meta.width, row.meta.height, sr, durMs, decodeStub(bytes))
              case None => stub
            }
          }
          case _ => stub
        }
      }
    }
  }

  /** Frame sampling stub for video payloads: deterministic byte-slice
    * "frames" (every `stride`-th window) — real implementation would seek
    * keyframes; the explode-to-rows plumbing is the Spark-side contract. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val stride = greatest(expr(s"CAST(length(payload) AS BIGINT) div $nFrames"), lit(1L))
    media
      .filter(col("meta.modality") === "video" && col("payload").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"),
        stride.as("stride"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * col("stride")).as("byte_offset"))
  }

  /** Metadata-only scan: verifies that projecting metadata never reads the
    * payload column (check ReadSchema in .explain — binary absent). */
  def metaSummary(media: DataFrame): DataFrame =
    media.groupBy(col("meta.modality").as("modality"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.durationMs")).as("avg_duration_ms"))

  // ------------------------------------------------------------------
  // Perceptual image hashing (DCT pHash) — REAL, pure JDK end to end.
  // ------------------------------------------------------------------

  final case class PhashRow(media_id: Long, phash: Option[Long])

  private val PhashN = 32
  /** DCT-II basis: cos((2x+1)·u·π/64) for u,x in [0,32). */
  private lazy val dctCos: Array[Array[Double]] =
    Array.tabulate(PhashN, PhashN)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * PhashN)))

  /** 64-bit DCT perceptual hash (the classic pHash recipe): decode with
    * `javax.imageio`, box-average the Rec. 601 luminance onto a 32×32
    * grid (integer box sums — no Graphics2D interpolation, so the
    * downsample is bit-deterministic), 2-D DCT-II, keep the low-frequency
    * 8×8 block, threshold each coefficient against the block's lower
    * median. Bit i = u·8+v. Robust to rescaling and small edits (the
    * low-frequency spectrum barely moves), which Hamming-bands into
    * near-dup candidates exactly like SimHash does for text. Returns
    * None for payloads no installed reader recognizes — same fallback
    * contract as decodeImage. */
  def phash64(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    // 32×32 box-average luminance: per target cell, average the exact
    // pixel box [floor(t·d/N), max(+1, floor((t+1)·d/N))) — every cell
    // gets ≥1 pixel whichever side of 32 the dimension is on
    val lum = Array.ofDim[Double](PhashN, PhashN)
    val row = new Array[Int](w)
    var ty = 0
    while (ty < PhashN) {
      val y0 = (ty.toLong * h / PhashN).toInt
      val y1 = math.max(y0 + 1, ((ty + 1).toLong * h / PhashN).toInt)
      val sums = new Array[Long](PhashN)
      val cnts = new Array[Long](PhashN)
      var y = y0
      while (y < y1) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var tx = 0
        while (tx < PhashN) {
          val x0 = (tx.toLong * w / PhashN).toInt
          val x1 = math.max(x0 + 1, ((tx + 1).toLong * w / PhashN).toInt)
          var x = x0
          while (x < x1) {
            val rgb = row(x)
            sums(tx) += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            cnts(tx) += 1
            x += 1
          }
          tx += 1
        }
        y += 1
      }
      var tx = 0
      while (tx < PhashN) {
        lum(ty)(tx) += sums(tx).toDouble / cnts(tx)
        tx += 1
      }
      ty += 1
    }
    // low-frequency 8×8 of the 2-D DCT-II (basis products, unscaled —
    // the median threshold is scale-invariant)
    val coeffs = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < PhashN) {
          var x = 0
          val cu = dctCos(u)(y)
          while (x < PhashN) { s += lum(y)(x) * cu * dctCos(v)(x); x += 1 }
          y += 1
        }
        coeffs(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    // DC (i=0) is excluded — it is orders of magnitude larger than the AC
    // coefficients and carries only global brightness; bit 0 stays 0 and
    // the median is the lower median of the 63 AC coefficients
    val med = coeffs.drop(1).sorted.apply(31)
    var bits = 0L
    var i = 1
    while (i < 64) {
      if (coeffs(i) > med) bits |= (1L << i)
      i += 1
    }
    Some(bits)
  }

  /** Per-image perceptual hashes over the typed media Dataset — the same
    * mapPartitions batch shape as extractFeatures (decode cost rides the
    * scan; nothing shuffles). Null phash = undecodable payload. */
  def imagePhash(media: Dataset[MediaRow]): Dataset[PhashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(r => PhashRow(r.media_id, phash64(r.payload))))
  }

  /** Near-duplicate IMAGES: perceptual hashes → Hamming band-bucket join
    * (Dedup.hammingNearDups, 8×8-bit bands → full recall for
    * maxHamming ≤ 7). The image twin of SimHash text near-dup: resized /
    * lightly-edited copies land within a few bits of each other while the
    * candidate join stays bucket-fenced — no all-pairs image compare. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int): DataFrame = {
    val hashed = imagePhash(media).filter(_.phash.isDefined).toDF()
    Dedup.hammingNearDups(hashed, "media_id", "phash",
      hashBits = 64, nBands = 8, maxHamming = maxHamming)
  }
}
