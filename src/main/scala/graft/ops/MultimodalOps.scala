package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch transforms
  * (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * container — producing deterministic md5-derived pseudo-features, so
  * the Spark-side plumbing (binary column, schema, partitioning, batch
  * iterator shape) is real and oracle-checkable while the codec call is
  * swappable.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 digest: String, width: Int, height: Int)

  /** Synthesize a media table from the documents table: payload = the
    * text's bytes (a deterministic stand-in for image/audio bytes),
    * kind round-robins over the modalities.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode / feature-extraction over the binary column.
    *
    * STUB: a real deployment calls the codec here (e.g. TwelveMonkeys /
    * javacv) per batch; the deterministic fake derives dimensions from
    * the payload digest so the full pipeline is verifiable end-to-end.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup (codec contexts are expensive: open once)
      val hexChars = "0123456789abcdef"
      batch.map { m =>
        val digest = org.apache.commons.codec.digest.DigestUtils.md5Hex(m.payload)
        // --- STUB DECODE: dimensions from digest, not a real codec ---
        val width = 16 + hexChars.indexOf(digest.charAt(0))
        val height = 16 + hexChars.indexOf(digest.charAt(1))
        MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong, digest, width, height)
      }
    }
  }

  /** Frame sampling for video payloads: one row per sampled frame with a
    * deterministic frame digest (explode pattern — UDTF shape).
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame = {
    val f = features.toDF()
    f.filter(col("kind") === "video")
      .withColumn("n_frames", (floor(col("n_bytes") / 100) + 1).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_digest",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"), col("frame_digest"))
  }

  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaFromDocuments(spark, dir)).toDF()

  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(decodeFeatures(mediaFromDocuments(spark, dir)))
}
