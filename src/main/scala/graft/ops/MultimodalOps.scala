package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch transforms
  * (the Scala analog of `mapInPandas` batch UDFs).
  *
  * ALL THREE modalities are real codecs — no stubs:
  *
  *  - image: PNG through the JDK's javax.imageio codec
  *    ([[MultimodalOps.decodeImages]]);
  *  - audio: WAV/PCM through the JDK's javax.sound.sampled parser,
  *    payloads from a hand-rolled RIFF writer
  *    ([[MultimodalOps.decodeAudio]]);
  *  - video: uncompressed 24-bit DIB frames in a hand-written AVI/RIFF
  *    container, decoded by an independent chunk-walking parser
  *    ([[MultimodalOps.decodeVideo]]) — lossless, so decode must invert
  *    encode exactly and every statistic is reconstructible by pure
  *    arithmetic (the same write/parse-inversion discipline as the PNG
  *    and WAV legs; the JDK ships no video codec, so both sides of the
  *    inversion are implemented here against the public RIFF/AVI/DIB
  *    layout).
  *
  * Every decode drops undecodable payloads row-locally (None/catch →
  * flatMap) — one corrupt blob must never abort a 100 TB job.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Unified per-modality features, all reconstructible from the
    * generation formulas: image → (width, height, 1 unit, luma sum);
    * audio → (0, 0, n_samples, abs-sample sum); video → (width, height,
    * n_frames, luma sum over all frames).
    */
  final case class MediaFeatures(doc_id: Long, kind: String, width: Int,
                                 height: Int, n_units: Long, sum_stat: Long)

  /** One REAL media payload per document, kind round-robin over the
    * modalities — PNG, WAV, or AVI bytes from the deterministic
    * generators, so the decode queries exercise actual codecs end to
    * end.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // NO Par.spread (r6 pass-4 A/B, three sessions): the mixed-modality
    // rows average ~1/3 of the all-PNG per-row cost, and the spread
    // exchange now outweighs the parallelism for every consumer but
    // q_media_frames (decode 0.335/0.289 s unspread vs 0.436/0.357
    // spread; audio/video a wash; frames alone read ~0.04 s better
    // spread — net across the four consumers favors removal).
    // [[imagesFromDocuments]] keeps its spread: all-PNG rows still pay
    // ~3x the exchange cost in single-split codec work (A/B +0.4 s).
    Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory PNG encode
        it.map { id =>
          (id % 3) match {
            case 0 => MediaRow(id, "image", genPng(id))
            case 1 => MediaRow(id, "audio", genWav(id))
            case _ => MediaRow(id, "video", genAvi(id))
          }
        }
      }
  }

  /** Batched decode / feature-extraction over the binary column: one
    * REAL codec dispatch per row by modality (PNG pixels, WAV samples,
    * AVI/DIB frames), per-partition codec setup, undecodable payloads
    * dropped.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      javax.imageio.ImageIO.setUseCache(false) // see decodeImages
      batch.flatMap { m =>
        m.kind match {
          case "image" => decodePngRow(m.payload).map { case (w, h, sum) =>
            MediaFeatures(m.doc_id, m.kind, w, h, 1L, sum)
          }
          case "audio" => decodeWavRow(m.payload).map { case (_, n, sumAbs, _) =>
            MediaFeatures(m.doc_id, m.kind, 0, 0, n, sumAbs)
          }
          case "video" => parseAvi(m.payload).map { case (w, h, frames) =>
            MediaFeatures(m.doc_id, m.kind, w, h, frames.size.toLong, frames.sum)
          }
          case _ => None
        }
      }
    }
  }

  /** Frame sampling for video payloads: one row per REAL decoded frame
    * with its pixel-luma sum (explode pattern — UDTF shape; the frame
    * count and every sum are pure arithmetic of the generation
    * formula).
    */
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_luma: Long)

  def sampleFrames(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        if (m.kind != "video") Nil
        else parseAvi(m.payload).toSeq.flatMap { case (_, _, frames) =>
          frames.iterator.zipWithIndex.map { case (sum, i) =>
            FrameRow(m.doc_id, i.toLong, sum)
          }
        }
      }
    }
  }

  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaFromDocuments(spark, dir)).toDF()

  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, dir)).toDF()

  // ------------------------------------------------------------------
  // REAL image decode — the JDK ships a PNG codec (javax.imageio), so
  // the image modality needs no stub: deterministic grayscale PNGs are
  // synthesized per doc, and the operator decodes ACTUAL pixels. The
  // oracle recomputes the expected stats from the generation formula —
  // decode must invert encode exactly (PNG is lossless) for the query
  // to pass.
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

  /** Row-local PNG decode → (width, height, luma sum); undecodable
    * bytes → None (ImageIO returns null rather than throwing).
    */
  private def decodePngRow(payload: Array[Byte]): Option[(Int, Int, Long)] =
    Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
        y += 1
      }
      (w, h, sum)
    }

  def imagesFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // spread before the codec maps — see mediaFromDocuments
    Par.spread(Tables.read(spark, dir, "documents"), dir)
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
      // a corrupt payload skips the row instead of NPE-ing the task —
      // the missing-input drop semantics of the rest of the engine
      batch.flatMap { m =>
        decodePngRow(m.payload).map { case (w, h, sum) =>
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
  // the generation formula.
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

  /** Row-local WAV decode through the JDK parser → (sample_rate,
    * n_samples, abs sum, abs peak); any malformed payload (unsupported
    * format, truncated/negative chunk sizes, off-layout stereo/8-bit)
    * → None — one corrupt row must not abort the task.
    */
  private def decodeWavRow(payload: Array[Byte]): Option[(Int, Long, Long, Int)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        // a parseable WAV in a layout this operator doesn't handle
        // (stereo / 8-bit / big-endian) DROPS the row like any other
        // undecodable payload
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
          Some((fmt.getSampleRate.toInt, n.toLong, sumAbs, peak))
        }
      } finally ais.close()
    } catch {
      // not just UnsupportedAudioFileException: a RIFF payload the
      // reader recognizes but can't parse surfaces as IOException or a
      // runtime exception from readAllBytes — all are "corrupt payload
      // drops the row", never "abort the task"
      case NonFatal(_) => None
    }

  def audioFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.read(spark, dir, "documents")
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
        decodeWavRow(m.payload).map { case (sr, n, sumAbs, peak) =>
          AudioFeatures(m.doc_id, sr, n, sumAbs, peak)
        }
      }
    }
  }

  def audioDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeAudio(audioFromDocuments(spark, dir)).toDF()

  // ------------------------------------------------------------------
  // REAL video decode — the JDK ships no video codec, but a video
  // container with UNCOMPRESSED frames needs none: the payload is a
  // hand-written AVI/RIFF (the same container family as WAV) carrying
  // 24-bit bottom-up DIB frames, and the decoder is an independent
  // RIFF chunk walker + raw pixel parse. Lossless end to end, so the
  // oracle recomputes every frame statistic from the generation
  // formula — a true write/parse inversion with zero stubbed steps.
  // ------------------------------------------------------------------

  final case class VideoFeatures(doc_id: Long, width: Int, height: Int,
                                 n_frames: Long, luma_sum: Long)

  /** Deterministic test clip for doc `id`: 2 + id%4 uncompressed
    * 24-bit DIB frames of (8 + id%8) × (8 + (id*5)%8) gray pixels,
    * luma(f, x, y) = (id*31 + f*17 + x*7 + y*13) mod 256, in a minimal
    * spec-conformant AVI: RIFF('AVI ' LIST(hdrl avih LIST(strl strh
    * strf)) LIST(movi 00db…)), rows bottom-up and 4-byte padded as DIB
    * requires.
    */
  def genAvi(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 8).toInt
    val h = 8 + ((docId * 5) % 8).toInt
    val nf = 2 + (docId % 4).toInt
    val stride = ((3 * w + 3) / 4) * 4
    val frameSize = stride * h
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nf * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def fcc(s: String): Unit = bb.put(s.getBytes(ascii))
    fcc("RIFF"); bb.putInt(riffSize); fcc("AVI ")
    fcc("LIST"); bb.putInt(hdrlSize); fcc("hdrl")
    fcc("avih"); bb.putInt(56)
    bb.putInt(66667); bb.putInt(0); bb.putInt(0); bb.putInt(0) // usec/frame, maxBps, pad, flags
    bb.putInt(nf); bb.putInt(0); bb.putInt(1); bb.putInt(frameSize) // frames, initial, streams, bufSize
    bb.putInt(w); bb.putInt(h)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // reserved[4]
    fcc("LIST"); bb.putInt(strlSize); fcc("strl")
    fcc("strh"); bb.putInt(56)
    fcc("vids"); fcc("DIB ")
    bb.putInt(0); bb.putShort(0); bb.putShort(0) // flags, priority, language
    bb.putInt(0); bb.putInt(1); bb.putInt(15) // initialFrames, scale, rate
    bb.putInt(0); bb.putInt(nf); bb.putInt(frameSize) // start, length, bufSize
    bb.putInt(0); bb.putInt(0) // quality, sampleSize
    bb.putShort(0); bb.putShort(0); bb.putShort(w.toShort); bb.putShort(h.toShort) // rcFrame
    fcc("strf"); bb.putInt(40) // BITMAPINFOHEADER
    bb.putInt(40); bb.putInt(w); bb.putInt(h)
    bb.putShort(1); bb.putShort(24) // planes, bits
    bb.putInt(0); bb.putInt(frameSize) // BI_RGB (uncompressed), sizeImage
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fcc("LIST"); bb.putInt(moviSize); fcc("movi")
    var f = 0
    while (f < nf) {
      fcc("00db"); bb.putInt(frameSize)
      var y = h - 1 // DIB rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val l = ((docId * 31 + f * 17 + x * 7 + y * 13) % 256).toByte
          bb.put(l); bb.put(l); bb.put(l) // B, G, R
          x += 1
        }
        var pad = stride - 3 * w
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    bb.array()
  }

  /** Independent AVI/RIFF parse: chunk-walk to strf for the DIB shape
    * (must be uncompressed 24-bit), then per 00db/00dc frame read the
    * bottom-up padded pixel rows and integrate luma = (r+g+b)/3.
    * Returns (width, height, per-frame luma sums); ANY malformed
    * payload — wrong magic, truncated chunks, sizes past the buffer,
    * compressed or non-24-bit frames — drops to None.
    */
  def parseAvi(bytes: Array[Byte]): Option[(Int, Int, Seq[Long])] =
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      def fcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, ascii)
      }
      if (fcc() != "RIFF") return None
      val riffSize = bb.getInt
      if (fcc() != "AVI ") return None
      val end = math.min(bytes.length, 8 + riffSize)
      var w = -1
      var h = -1
      var dibOk = false
      val frames = Seq.newBuilder[Long]
      def walk(listEnd: Int, depth: Int): Unit = {
        // legitimate AVI nesting is 3 deep (RIFF > hdrl > strl); a
        // crafted payload of recursive LIST headers must hit this bound
        // (caught → row drops), not a StackOverflowError, which is
        // fatal and would escape the NonFatal catch
        require(depth <= 8, "over-nested RIFF lists")
        while (bb.position() < listEnd) {
          val id = fcc()
          val sz = bb.getInt
          require(sz >= 0, "negative chunk size")
          val next = bb.position() + sz + (sz & 1) // RIFF word alignment
          require(next <= listEnd, "chunk overruns its list")
          id match {
            case "LIST" =>
              val ltype = fcc()
              if (ltype == "hdrl" || ltype == "strl" || ltype == "movi")
                walk(next, depth + 1)
              else bb.position(next)
            case "strf" =>
              bb.getInt // biSize
              w = bb.getInt; h = bb.getInt
              bb.getShort // planes
              val bits = bb.getShort
              val comp = bb.getInt
              dibOk = bits == 24 && comp == 0 && w > 0 && h > 0
              bb.position(next)
            case "00db" | "00dc" =>
              require(dibOk, "frame chunk before an uncompressed-DIB strf")
              val stride = ((3 * w + 3) / 4) * 4
              require(sz >= stride * h, "frame chunk shorter than its raster")
              val base = bb.position()
              var sum = 0L
              var y = 0
              while (y < h) {
                val row = base + (h - 1 - y) * stride // undo bottom-up order
                var x = 0
                while (x < w) {
                  val b = bytes(row + 3 * x) & 0xFF
                  val g = bytes(row + 3 * x + 1) & 0xFF
                  val r = bytes(row + 3 * x + 2) & 0xFF
                  sum += (r + g + b) / 3
                  x += 1
                }
                y += 1
              }
              frames += sum
              bb.position(next)
            case _ => bb.position(next)
          }
        }
      }
      walk(end, 1)
      val fs = frames.result()
      if (dibOk && fs.nonEmpty) Some((w, h, fs)) else None
    } catch { case NonFatal(_) => None }

  def videosFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.read(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MediaRow(id, "video", genAvi(id))))
  }

  /** Batched REAL decode over the AVI binary column: container walk +
    * raw DIB pixel integration per partition batch. Undecodable
    * payloads drop the row.
    */
  def decodeVideo(media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        parseAvi(m.payload).map { case (w, h, frames) =>
          VideoFeatures(m.doc_id, w, h, frames.size.toLong, frames.sum)
        }
      }
    }
  }

  def videoDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeVideo(videosFromDocuments(spark, dir)).toDF()
}
