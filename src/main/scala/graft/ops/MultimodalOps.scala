package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch transforms
  * (the Scala analog of `mapInPandas` batch UDFs).
  *
  * Image decode is REAL (the JDK ships a PNG codec — see
  * [[MultimodalOps.decodeImages]]) and so is audio (WAV/PCM through the
  * JDK's javax.sound.sampled parser — see
  * [[MultimodalOps.decodeAudio]]). Only VIDEO decode stays a
  * clearly-marked STUB (no video codec in the JDK) producing
  * deterministic md5-derived pseudo-features, so the Spark-side
  * plumbing (binary column, schema, partitioning, batch iterator
  * shape) is real and oracle-checkable while the codec call is
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

  // ------------------------------------------------------------------
  // REAL image decode — the JDK ships a PNG codec (javax.imageio), so
  // the image modality needs no stub: deterministic grayscale PNGs are
  // synthesized per doc, and the operator decodes ACTUAL pixels. The
  // oracle recomputes the expected stats from the generation formula —
  // decode must invert encode exactly (PNG is lossless) for the query
  // to pass. Audio/video stay stubbed (no codecs for them in the JDK).
  // ------------------------------------------------------------------

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                                 luma_sum: Long)

  /** Deterministic grayscale test image for doc `id`: dimensions and
    * every pixel derive from `id` alone, so expected decoded stats are
    * pure arithmetic. luma(x, y) = (id*31 + x*7 + y*13) mod 256.
    */
  def genPng(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 16).toInt
    val h = 16 + ((docId * 3) % 16).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def imagesFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory encode too
        it.map(id => MediaRow(id, "image", genPng(id)))
      }
  }

  /** Batched REAL decode: per-partition iterator over the binary
    * column, one ImageIO decode per row (codec state per batch — the
    * mapInPandas shape). Emits actual pixel statistics.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition codec setup: ImageIO defaults to a DISK-backed
      // stream cache (a temp file per decode!) — in-memory payloads
      // never need it and 32 concurrent tasks contend on tmpfs
      javax.imageio.ImageIO.setUseCache(false)
      // ImageIO.read returns null (no exception) for undecodable bytes:
      // a corrupt payload skips the row instead of NPE-ing the task —
      // the missing-input drop semantics of the rest of the engine
      batch.flatMap { m =>
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
            y += 1
          }
          ImageFeatures(m.doc_id, w, h, sum)
        }
      }
    }
  }

  /** Nearest-neighbor resize to 8×8 over the REAL decoded pixels; the
    * digest is md5 of the row-major comma-joined luma values, so the
    * oracle can derive it from the generation formula.
    */
  def resizeImages(media: Dataset[MediaRow], side: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false) // see decodeImages
      batch.flatMap { m =>
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val lumas = for (yi <- 0 until side; xi <- 0 until side) yield {
            val sx = xi * w / side
            val sy = yi * h / side
            img.getRGB(sx, sy) & 0xFF
          }
          (m.doc_id, org.apache.commons.codec.digest.DigestUtils
            .md5Hex(lumas.mkString(",")))
        }
      }
    }.toDF("doc_id", "resized_digest")
  }

  def imageDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeImages(imagesFromDocuments(spark, dir)).toDF()

  def imageResizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizeImages(imagesFromDocuments(spark, dir))

  // ------------------------------------------------------------------
  // REAL audio decode — WAV/PCM needs no external codec: the payload is
  // a RIFF container the JDK parses natively (javax.sound.sampled).
  // Deterministic 16-bit mono WAVs are synthesized per doc by a
  // hand-rolled RIFF writer; the operator decodes them through the
  // JDK's own WAV reader (a true write/parse inversion, like the PNG
  // leg), and the oracle recomputes the expected sample statistics from
  // the generation formula. Video remains the only stubbed codec.
  // ------------------------------------------------------------------

  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
                                 n_samples: Long, sum_abs: Long, peak_abs: Int)

  /** Deterministic test clip for doc `id`: 8 kHz mono 16-bit PCM,
    * n = 256 + id % 256 samples, sample(i) = (id*37 + i*101) mod 65536
    * - 32768 — full-range, reconstructible by pure arithmetic.
    */
  def genWav(docId: Long): Array[Byte] = {
    val n = 256 + (docId % 256).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(8000) // sample rate
    bb.putInt(8000 * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes(ascii)); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((docId * 37 + i * 101) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  def audioFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "audio", genWav(id))))
  }

  /** Batched REAL decode through the JDK's WAV parser: RIFF header →
    * format fields, data chunk → little-endian int16 samples → integral
    * statistics. Undecodable payloads drop the row (same semantics as
    * the image leg — AudioSystem throws, ImageIO returns null).
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try {
            val fmt = ais.getFormat
            // a parseable WAV in a layout this operator doesn't handle
            // (stereo / 8-bit / big-endian) DROPS the row like any other
            // undecodable payload — one off-format row must not abort
            // the job
            if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
              fmt.getChannels != 1) None
            else {
            val data = ais.readAllBytes()
            val n = data.length / 2
            var sumAbs = 0L
            var peak = 0
            var i = 0
            while (i < n) {
              val s = ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort.toInt
              val a = math.abs(s)
              sumAbs += a
              if (a > peak) peak = a
              i += 1
            }
            Some(AudioFeatures(m.doc_id, fmt.getSampleRate.toInt, n.toLong,
              sumAbs, peak))
            }
          } finally ais.close()
        } catch {
          // not just UnsupportedAudioFileException: a RIFF payload the
          // reader recognizes but can't parse (truncated/negative chunk
          // sizes) surfaces as IOException or a runtime exception from
          // readAllBytes — all of those are "corrupt payload drops the
          // row", never "abort the task"
          case scala.util.control.NonFatal(_) => None
        }
      }
    }
  }

  def audioDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAudio(audioFromDocuments(spark, dir)).toDF()
}
