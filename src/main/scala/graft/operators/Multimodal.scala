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
  * - the decoder itself is STUBBED with a deterministic fake (this
  *   container has no image/audio codecs) — the Spark-side plumbing
  *   (schema, partitioning, batch iteration, feature schema) is real and
  *   tested; swap `decodeStub` for a JNI/FFM codec binding in production.
  */
object Multimodal {

  final case class MediaMeta(modality: String, width: Int, height: Int,
                             sampleRateHz: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, modality: String,
                                 byte_len: Long, sha: String,
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

  /** Batch feature extraction: one pass per partition, payload pruned from
    * the output (features are narrow; never carry bytes forward). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { row =>
        val bytes = Option(row.payload).getOrElse(Array.emptyByteArray)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        MediaFeatures(row.media_id, row.meta.modality,
          bytes.length.toLong, sha, decodeStub(bytes))
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
}
