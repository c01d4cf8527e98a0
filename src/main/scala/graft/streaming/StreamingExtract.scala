package graft.streaming

import graft.pipeline.{ExtractPipeline, PageRow}
import org.apache.spark.sql.{Dataset, SparkSession}
import scala.collection.mutable
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface for the extraction job.
  *
  * The north rule's "resumable from snapshot + checkpoint manifests" is
  * incremental batch (SURVEY.md §2.8) — TableIO covers that path. This
  * module is the streaming-native equivalent: `readStream` over the
  * pages directory with `Trigger.AvailableNow`, the same per-row
  * extractor, exactly-once sink via Spark's own checkpoint dir. New
  * parquet files dropped into the source directory are picked up on the
  * next run; processed files are never re-extracted (file-source log in
  * the checkpoint).
  */
object StreamingExtract {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Incremental extraction: process all files available now, then stop.
    * Returns after the sink is fully committed.
    */
  def runAvailableNow(spark: SparkSession, sourceDir: String, sinkDir: String,
                      checkpointDir: String, charset: String = "utf-8"): Unit = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(sourceDir)
      .as[PageRow]
    // same row-local extractor as the batch path; no shuffle
    val extracted = pages.mapPartitions(it =>
      it.map(p => ExtractPipeline.extractOne(p, charset)))
    val q: StreamingQuery = extracted.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** First-seen streaming dedup across micro-batches: per-url state via
    * `flatMapGroupsWithState` (`KeyValueGroupedDataset` custom state) —
    * a url is emitted the first time it appears and suppressed on every
    * later arrival, across batches and across restarts (state lives in
    * the checkpoint). The crawl-recrawl dedup shape: at cluster scale
    * state is HDFS/RocksDB-backed and partitioned by the group key.
    */
  def dedupStream(pages: Dataset[PageRow]): Dataset[PageRow] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    pages
      .groupByKey(_.url)
      .flatMapGroupsWithState[Boolean, PageRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[PageRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // url already emitted earlier
          else {
            state.update(true)
            rows.take(1) // first occurrence within this batch wins
          }
      }
  }

  /** Incremental extraction with cross-batch url dedup: dedupStream →
    * extractor → parquet sink, exactly-once via the checkpoint.
    */
  def runDedupAvailableNow(spark: SparkSession, sourceDir: String, sinkDir: String,
                           checkpointDir: String, charset: String = "utf-8"): Unit = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .parquet(sourceDir)
      .as[PageRow]
    val extracted = dedupStream(pages).mapPartitions(it =>
      it.map(p => ExtractPipeline.extractOne(p, charset)))
    val q: StreamingQuery = extracted.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Row-local content fingerprint — the same normalization the batch
    * dedup family uses (`TextAnalysisOps.fingerprint`: lowercase, strip
    * non-alphanumerics, collapse whitespace, md5), so batch and stream
    * agree on what "same content" means.
    *
    * Two deliberate details:
    *  - lowercase replicates Spark's `lower()` exactly: ASCII-only
    *    strings take the locale-independent ASCII path, anything else
    *    falls to `String.toLowerCase()` under the DEFAULT locale (what
    *    UTF8String's slow path does) — a Locale.ROOT scalar would
    *    diverge from the batch column on e.g. tr_TR JVMs.
    *  - text whose ASCII normalization is EMPTY (CJK/Cyrillic/Arabic
    *    pages, empty extractions) must NOT collapse onto one
    *    fingerprint — that would silently drop every such document
    *    after the first. Those fall back to exact-content identity
    *    (md5 of the raw text, distinct key space).
    */
  def contentFingerprint(text: String): String = {
    val lower =
      if (text.forall(_ < 0x80)) text.toLowerCase(java.util.Locale.ROOT)
      else text.toLowerCase()
    val norm = lower.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    if (norm.nonEmpty) "fp:" + org.apache.commons.codec.digest.DigestUtils.md5Hex(norm)
    else "raw:" + org.apache.commons.codec.digest.DigestUtils.md5Hex(text)
  }

  /** Cross-batch CONTENT dedup: extraction first, then state keyed by
    * the normalized-text fingerprint — the first document carrying a
    * given content fingerprint is emitted, every later re-crawl of the
    * same content (different url, same text) is suppressed, across
    * micro-batches and restarts (state lives in the checkpoint). The
    * within-batch winner is the smallest url, so the output is
    * deterministic under any arrival order. State per key is one
    * boolean — at crawl scale this is the RocksDB-backed seen-set
    * shape, partitioned by fingerprint.
    */
  def contentDedupStream(pages: Dataset[PageRow],
                         charset: String = "utf-8"): Dataset[graft.pipeline.ExtractedDoc] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    pages
      .mapPartitions(it => it.map(p => ExtractPipeline.extractOne(p, charset)))
      .groupByKey(d => contentFingerprint(d.text))
      .flatMapGroupsWithState[Boolean, graft.pipeline.ExtractedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[graft.pipeline.ExtractedDoc],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.url))
          }
      }
  }

  /** Max stored text versions per url per band bucket (see the slot
    * policy inside [[nearDupVotes]]).
    */
  val PerUrlReps: Int = 4

  /** MinHash band keys of a text — the SAME banding as the batch LSH
    * family ([[graft.ops.DedupOps.minhashBands]]: 8 hashes, 4 bands of
    * 2, band key = md5 of the '|'-joined 16-hex signatures), via the
    * shared [[graft.functions.MinHashCore]], so batch and stream agree
    * on what "candidate near-duplicate" means. The band index prefixes
    * the key (bands are independent hash tables).
    */
  def minhashBandKeys(text: String): Seq[String] = {
    val sigs = graft.functions.MinHashCore.sigs(text, graft.ops.DedupOps.NumHashes)
    sigs.grouped(graft.ops.DedupOps.BandSize).zipWithIndex.map { case (g, b) =>
      b + ":" + org.apache.commons.codec.digest.DigestUtils.md5Hex(g.mkString("|"))
    }.toSeq
  }

  /** Streaming NEAR-duplicate dedup — the streaming face of the batch
    * MinHash-LSH → verify family: each extracted document explodes into
    * its [[minhashBandKeys]], per-band state holds the texts already
    * seen in that bucket, and a document whose bucket contains a text
    * with word-3-gram Jaccard >= `jaccardMin` is voted a duplicate in
    * that band (colliding in ANY band suppresses — assemble with
    * [[runNearDupDedupAvailableNow]]). State is cross-batch and
    * cross-restart (checkpoint-backed; RocksDB-shaped at crawl scale,
    * partitioned by band key), per-bucket reps are occupancy-capped at
    * `maxBucketReps` (the batch family's bounded-bucket rule) and at
    * [[PerUrlReps]] versions per url, and within a batch group
    * documents apply in a deterministic total order, so the output is
    * deterministic under any arrival order.
    *
    * Like the batch connected-components attribution, a document
    * suppressed via one band still registers as a representative in its
    * OTHER bands: later documents similar to it dedup against the whole
    * near-dup cluster, not only against emitted survivors.
    *
    * Scale note: reps store the verification TEXT, so state holds up to
    * nBands × (occupancy cap) bucket-representative texts — exact
    * verification's price. A 10^12-doc deployment that can't afford it
    * swaps the stored text for the 8-hash minhash signature and
    * verifies by signature agreement (estimated Jaccard) — same
    * plumbing, O(1) rep size, approximate verify; the batch path stays
    * the exact one.
    */
  def nearDupVotes(pages: Dataset[PageRow], charset: String = "utf-8",
                   jaccardMin: Double = 0.8, maxBucketReps: Int = 32)
      : Dataset[(graft.pipeline.ExtractedDoc, Boolean)] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    pages
      .mapPartitions(it => it.map(p => ExtractPipeline.extractOne(p, charset)))
      .flatMap(d => minhashBandKeys(d.text).map(bk => (bk, d)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(String, String)],
        (graft.pipeline.ExtractedDoc, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, graft.pipeline.ExtractedDoc)],
         state: GroupState[List[(String, String)]]) =>
          var reps = state.getOption.getOrElse(List.empty[(String, String)])
          // deterministic TOTAL order on the full document — the sort
          // key and the in-group identity must match the downstream
          // per-doc vote grouping exactly: two copies differing only in
          // warc_ts are DIFFERENT vote keys, so every band must pick
          // the same winner or the votes split across keys (double
          // emission / missed suppression). The key enumerates every
          // field explicitly and injectively — a toString would render
          // the Timestamp through the executor's DEFAULT TIMEZONE
          // (bands on differently-configured executors could then
          // disagree) and is non-injective across a DST fall-back.
          val sorted = rows.map(_._2).toSeq.sortBy(d =>
            (d.url, d.text, d.warc_ts.getTime, d.lang,
              (d.blocks.toLong << 32) | (d.content_blocks.toLong & 0xffffffffL),
              d.html_bytes, d.text_chars, d.parse_ok))
          // FULLY identical in-batch copies collapse to ONE vote row:
          // they are one vote key downstream, and a second row voting
          // dup=true against the first's just-stored text would
          // suppress both — zero emissions instead of one
          val seenHere = mutable.Set.empty[graft.pipeline.ExtractedDoc]
          val out = sorted.flatMap { d =>
            if (!seenHere.add(d)) None
            else {
              // no url self-exemption: a recrawl carrying near-identical
              // content is a duplicate exactly like a mirror url is
              // (batch LSH pairs docs regardless of url)
              val dup = reps.exists { case (_, t) =>
                graft.functions.MinHashCore.shingleJaccard(t, d.text) >= jaccardMin
              }
              if (!dup) {
                // slot policy balancing three constraints of a bounded,
                // never-expiring state: (1) emitted text stays in state
                // while room remains (evicting it lets later near-dups
                // of emitted content escape); (2) one fast-drifting url
                // must not fill the bucket and permanently starve other
                // urls of registration (state has no timeout — a
                // poisoned bucket would never heal), so per-url slots
                // cap at PerUrlReps with oldest-version FIFO; (3) at
                // the bucket occupancy cap a url refreshes its own
                // oldest slot, and a brand-new url drops — the batch
                // family's bounded-bucket rule
                val mine = reps.count(_._1 == d.url)
                if (mine >= PerUrlReps || reps.size >= maxBucketReps) {
                  val i = reps.indexWhere(_._1 == d.url)
                  if (i >= 0)
                    reps = reps.patch(i, Nil, 1) :+ ((d.url, d.text))
                } else reps = reps :+ ((d.url, d.text))
              }
              Some((d, dup))
            }
          }
          state.update(reps)
          out.iterator
      }
  }

  /** Incremental extraction with cross-batch NEAR-dup dedup: band votes
    * from [[nearDupVotes]] are assembled per document inside
    * `foreachBatch` (a plain batch aggregation — chaining a second
    * stateful operator is unnecessary because a document's votes all
    * land in the same micro-batch) and only documents no band flagged
    * are appended to the sink.
    */
  def runNearDupDedupAvailableNow(spark: SparkSession, sourceDir: String,
                                  sinkDir: String, checkpointDir: String,
                                  charset: String = "utf-8",
                                  jaccardMin: Double = 0.8): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max => smax}
    val pages = spark.readStream
      .schema(pageSchema)
      .parquet(sourceDir)
      .as[PageRow]
    val votes = nearDupVotes(pages, charset, jaccardMin).toDF("doc", "dup")
    val q: StreamingQuery = votes.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.groupBy(col("doc"))
          .agg(smax(col("dup")).as("dup"))
          .filter(!col("dup"))
          .select(col("doc.*"))
          .write.mode("append").parquet(sinkDir)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Windowed per-language extraction-rate metrics over the stream —
    * watermark + tumbling window aggregation (the streaming metrics
    * analog of the per-partition lineage rows).
    */
  def metricsQuery(pages: Dataset[PageRow], windowSec: Int = 60) = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), s"$windowSec seconds"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(length(col("html"))).as("html_bytes"))
  }
}
