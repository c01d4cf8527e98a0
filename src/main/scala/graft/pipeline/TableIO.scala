package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Iceberg-shaped table facade over Parquet + a JSON checkpoint
  * manifest, giving snapshot/resume semantics in this sandbox (no
  * Iceberg jars on the classpath — SURVEY.md §7.1.8). The interface is
  * what the production job would call against Iceberg
  * (`readTable` / `appendSnapshot` / `committedKeys`), so the swap is a
  * catalog config change, not a rewrite.
  *
  * Resume contract (north rule "resumable from snapshot + checkpoint
  * manifests"): each commit appends a snapshot directory
  * `snap-<k>/part-*.parquet` plus a line in `manifest.json` recording
  * the snapshot id and row count. Pending work = input anti-joined on
  * the committed key column, so a re-run after a partial failure
  * processes only missing rows and converges to the identical table.
  */
final class TableIO(val root: String) {
  import TableIO.Snapshot
  private val manifestPath = Paths.get(root, "manifest.json")

  /** Base64 of the READ-BACK schema json of a just-written snapshot —
    * the exact schema inference would produce for those files, recorded
    * in the manifest so [[readTable]] can skip the per-relation
    * inference job (schema evolution across snapshots falls back).
    */
  private def schema64Of(written: DataFrame): String =
    java.util.Base64.getEncoder.encodeToString(
      written.schema.json.getBytes(StandardCharsets.UTF_8))

  /** One manifest line; `schema64` is last so the fixed-order regex
    * parse of the leading fields is unaffected (legacy lines simply
    * lack it).
    */
  private def manifestLine(s: Snapshot): String =
    if (s.schema64.isEmpty) s"""{"id":${s.id},"dir":"${s.dir}","rows":${s.rows}}"""
    else s"""{"id":${s.id},"dir":"${s.dir}","rows":${s.rows},"schema64":"${s.schema64}"}"""

  /** Every commit also files a copy of the live manifest under
    * `manifests/manifest-<id>.json` — an append-only history that makes
    * any past snapshot restorable ([[rollbackTo]]), since the snapshot
    * dirs themselves are never deleted by commits.
    */
  private def historyDir = Paths.get(root, "manifests")

  private def historyIds(): Seq[Long] = {
    if (!Files.exists(historyDir)) return Nil
    val s = Files.list(historyDir)
    try s.toArray.toSeq.map(_.toString).flatMap(p =>
      """manifest-(\d+)\.json""".r.findFirstMatchIn(p).map(_.group(1).toLong))
    finally s.close()
  }

  /** Snapshot ids already claimed ON DISK — including directories whose
    * commit never completed (crashed or failed write). Counting them
    * keeps a same-writer retry moving forward past its own orphaned
    * reservation instead of colliding with it forever.
    */
  private def reservedDirIds(): Seq[Long] = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Nil
    val s = Files.list(rootPath)
    try s.toArray.toSeq.map(_.toString).flatMap(p =>
      """snap-(\d+)$""".r.findFirstMatchIn(p).map(_.group(1).toLong))
    finally s.close()
  }

  /** Ids are unique across the WHOLE history (incl. branches abandoned
    * by a rollback and orphaned reservations from failed writes), never
    * reused — a new commit after a rollback or a crash can't collide
    * with an existing snapshot dir.
    */
  private def nextId(): Long =
    (snapshots().map(_.id) ++ historyIds() ++ reservedDirIds())
      .maxOption.getOrElse(0L) + 1

  /** Reserve snapshot `id` by creating its data directory — an atomic
    * filesystem operation, so of two writers racing for the same id
    * exactly one proceeds. Orphaned reservations from crashed writes
    * don't wedge the table: [[nextId]] counts every on-disk dir, so a
    * retry simply claims the next free id.
    */
  private def reserveDir(id: Long): String = {
    val dir = s"snap-$id"
    Files.createDirectories(Paths.get(root))
    try { Files.createDirectory(Paths.get(root, dir)); dir }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"snapshot id $id already reserved under $root — concurrent writer " +
            "detected; this table root is single-writer and the losing commit " +
            "fails loudly instead of silently overwriting")
    }
  }

  /** The raw live-manifest bytes a commit was computed against (None =
    * no manifest yet). Checked again immediately before the atomic
    * install: if another writer's commit landed in between, THIS commit
    * throws instead of silently erasing that writer's manifest line.
    * (Best-effort on a filesystem without compare-and-swap — the
    * Iceberg swap this facade mimics is atomic at the catalog; the
    * documented model stays single-writer per root, with violations
    * loud, not lossy. The written data and history record survive
    * either way for manual recovery.)
    */
  private def manifestBase(): Option[String] =
    if (Files.exists(manifestPath))
      Some(new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8))
    else None

  /** Atomically install `lines` as the live manifest and file the
    * history copy for commit `id`, verifying the manifest is still the
    * one the commit was computed from.
    */
  private def commitManifest(lines: String, id: Long, base: Option[String]): Unit = {
    Files.createDirectories(historyDir)
    // CREATE_NEW: a same-id history file means another writer got here
    // first — fail rather than overwrite its record
    Files.write(historyDir.resolve(s"manifest-$id.json"),
      lines.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    if (manifestBase() != base)
      throw new IllegalStateException(
        s"manifest under $root changed while committing snapshot $id — " +
          "concurrent writer detected; this commit fails loudly instead of " +
          "erasing the other writer's commit (its data dir and history " +
          s"record manifest-$id.json remain on disk)")
    val tmp = Paths.get(root, ".manifest.tmp")
    Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def snapshots(): Seq[Snapshot] = {
    if (!Files.exists(manifestPath)) return Nil
    Files.readAllLines(manifestPath, StandardCharsets.UTF_8)
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty).map { line =>
        // fixed field order written by commit(); no general JSON parse needed
        val id = """"id":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
        val dir = """"dir":"([^"]+)"""".r.findFirstMatchIn(line).get.group(1)
        val rows = """"rows":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
        val schema64 = """"schema64":"([A-Za-z0-9+/=]*)"""".r
          .findFirstMatchIn(line).map(_.group(1)).getOrElse("")
        Snapshot(id, dir, rows, schema64)
      }
  }

  /** Single-entry relation memo for [[readTable]]: resolving a parquet
    * relation costs a driver job (file listing + schema inference), and
    * resume paths read the same table several times per run (probe,
    * payload, freshness). Keyed by the LIVE manifest bytes — snapshots
    * are immutable and the manifest names exactly the visible set, so
    * equal manifest ⟹ the cached plan still reads the correct files;
    * any commit/rollback changes the manifest and misses the cache.
    * This memoizes plan METADATA within one TableIO instance, never
    * query results (r6, guide §1.2).
    */
  @volatile private var relCache: Option[(Option[String], SparkSession, DataFrame)] = None

  /** All committed data across snapshots (empty DataFrame with the
    * given schema if nothing committed yet).
    */
  def readTable(spark: SparkSession): Option[DataFrame] = {
    val live = manifestBase()
    relCache match {
      case Some((m, s, df)) if m == live && (s eq spark) => Some(df)
      case _ =>
        val snaps = snapshots()
        if (snaps.isEmpty) None
        else {
          // commits record the written files' read-back schema in the
          // manifest (Iceberg-style table metadata, guide §6): when
          // every visible snapshot agrees on it, the read skips parquet
          // schema inference — which costs a Spark job per relation
          // resolution. Any legacy or disagreeing snapshot falls back
          // to plain inference.
          val paths = snaps.map(s => s"$root/${s.dir}")
          val schema64s = snaps.map(_.schema64).distinct
          val df = schema64s match {
            case Seq(s64) if s64.nonEmpty =>
              val json = new String(java.util.Base64.getDecoder.decode(s64),
                StandardCharsets.UTF_8)
              spark.read
                .schema(org.apache.spark.sql.types.DataType.fromJson(json)
                  .asInstanceOf[org.apache.spark.sql.types.StructType])
                .parquet(paths: _*)
            case _ => spark.read.parquet(paths: _*)
          }
          relCache = Some((live, spark, df))
          Some(df)
        }
    }
  }

  /** Append `df` as a new snapshot; manifest write is atomic (tmp +
    * move) so a crash mid-commit leaves the previous snapshot intact.
    */
  def appendSnapshot(df: DataFrame): Snapshot = {
    val base = manifestBase()
    val prev = snapshots()
    val id = nextId()
    val dir = reserveDir(id)
    // Append, NOT Overwrite: Overwrite DELETES the target first, and the
    // reserved dir IS the reservation marker — destroying it mid-write
    // opens a window where a concurrent writer's nextId() no longer sees
    // the claim, re-reserves the same id, and the two writers clobber
    // each other's _temporary staging (observed as a chmod-on-missing-
    // path task failure). reserveDir guarantees the dir was just created
    // empty, so Append lands exactly this write's files.
    df.write.mode(SaveMode.Append).parquet(s"$root/$dir")
    val written = df.sparkSession.read.parquet(s"$root/$dir")
    val rows = written.count()
    val snap = Snapshot(id, dir, rows, schema64Of(written))
    val all = (prev :+ snap).map(manifestLine).mkString("", "\n", "\n")
    commitManifest(all, id, base)
    snap
  }

  /** Input rows not yet present in the committed table, by key column.
    *
    * Two-phase shape so no payload column ever crosses an exchange: the
    * anti-join runs over keys alone (both scans prune to the key
    * column), and the input's full rows re-join by a semi join against
    * the surviving pending keys — broadcastable on an incremental
    * resume, so wide columns (page html, document text) stay in their
    * scan. A single anti-join of the FULL input against the committed
    * keys degrades to a sort-merge join once the committed side
    * outgrows the broadcast threshold on a mature table, shuffling
    * every payload byte to discover most rows are already done
    * (PlanSpec pins the pruned shape). Null-key rows can never be
    * committed and are always pending (a bare semi join would silently
    * drop them where the old anti-join kept them) — they ride the same
    * payload pass as a left-join non-match rather than a second scan.
    *
    * `input` is referenced twice (the keys branch and the payload
    * branch), which is free when Catalyst can column-prune it to the
    * key (any relational source: parquet, committed tables). An input
    * that Catalyst canNOT prune through — a typed `.map` synthesizing
    * rows — is computed in full in BOTH branches; for those, resolve
    * pending keys over a cheap key-only projection first and build
    * payload rows only for survivors (the
    * [[graft.ops.CorpusOps.corpusEndToEnd]] stage-E shape, via
    * [[graft.ops.ExtractOps.docUrlCol]]).
    */
  /** True iff [[pending]] over `input` has any row — answered from a
    * KEYS-ONLY anti-join (both scans prune to the key column), never
    * re-attaching the payload: the no-op resume's common probe carries
    * half of [[pending]]'s plan (r6, guide §1.2 — don't build what the
    * steady path throws away). No `.distinct()` on either side: an
    * anti-join's emptiness never needs deduped inputs, and resume keys
    * are unique per side anyway, so each distinct was a pure extra
    * exchange + aggregation (guide §2.4 "a distinct on data that is
    * already unique"). Equivalence with `pending(...).isEmpty`: a
    * null-key input row is always pending there, and the anti join
    * here KEEPS null keys (a null key equals nothing, so it never
    * matches a committed row), so both sides agree on emptiness.
    */
  def hasPending(input: DataFrame, keyCol: String): Boolean =
    readTable(input.sparkSession) match {
      case None => !input.select(col(keyCol)).isEmpty
      case Some(committed) =>
        !input.select(col(keyCol))
          .join(committed.select(col(keyCol)), Seq(keyCol), "left_anti")
          .isEmpty
    }

  def pending(input: DataFrame, keyCol: String): DataFrame =
    readTable(input.sparkSession) match {
      case None => input
      case Some(committed) =>
        val pendingKeys = input.select(col(keyCol)).where(col(keyCol).isNotNull)
          .distinct()
          .join(committed.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
          .withColumn("__graft_pending", lit(true))
        input.join(pendingKeys, Seq(keyCol), "left")
          .where(col("__graft_pending").isNotNull || col(keyCol).isNull)
          .select(input.columns.map(col): _*)
    }

  /** `MERGE INTO`-shaped upsert (Iceberg's idempotent-sink analog, the
    * Neo4j `UNWIND…MERGE` replacement of SURVEY §2.1 S5): committed rows
    * whose key collides with `updates` are replaced, new keys appended.
    * Implemented as survivors (committed anti-join updates) + updates,
    * written as a full replacement snapshot — a re-run with identical
    * input converges to the identical table (idempotent).
    */
  def mergeByKey(updates: DataFrame, keyCol: String): Snapshot = {
    val merged = readTable(updates.sparkSession) match {
      case None => updates
      case Some(committed) =>
        val survivors = committed.join(
          updates.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        survivors.unionByName(updates)
    }
    replaceWith(merged)
  }

  /** Replace the whole table content with `df` as a single new snapshot
    * (Iceberg `overwritePartitions` analog). Earlier snapshot dirs stay
    * on disk for rollback; the manifest only references the new one.
    */
  def replaceWith(df: DataFrame): Snapshot = {
    val base = manifestBase()
    val id = nextId()
    val dir = reserveDir(id)
    // materialize BEFORE truncating the manifest: df may read prior
    // snapshots. Append, not Overwrite — see appendSnapshot: the
    // reserved dir is the reservation marker and must never be deleted.
    df.write.mode(SaveMode.Append).parquet(s"$root/$dir")
    val written = df.sparkSession.read.parquet(s"$root/$dir")
    val rows = written.count()
    val snap = Snapshot(id, dir, rows, schema64Of(written))
    commitManifest(manifestLine(snap) + "\n", id, base)
    snap
  }

  /** Scoped delete — the `delete_by_report` / `delete_by_environment`
    * analog (load_to_neo4j.py:871-1022): rows matching `condition` are
    * removed by rewriting the survivors as a replacement snapshot (the
    * copy-on-write DELETE of table formats without positional deletes).
    * A re-extract of the deleted scope then converges via
    * [[mergeByKey]]/[[pending]]. No-op (None) on an empty table.
    */
  def deleteWhere(spark: SparkSession, condition: org.apache.spark.sql.Column): Option[Snapshot] =
    // SQL DELETE semantics: remove rows where the condition is TRUE;
    // rows where it evaluates NULL (e.g. a NULL key against isin) are
    // survivors — a bare !condition would silently destroy them
    readTable(spark).map(committed =>
      replaceWith(committed.filter(!coalesce(condition, lit(false)))))

  /** Key-list convenience over [[deleteWhere]] (delete one report's /
    * environment's rows by id).
    */
  def deleteByKeys(spark: SparkSession, keyCol: String, keys: Seq[String]): Option[Snapshot] =
    deleteWhere(spark, col(keyCol).isin(keys: _*))

  /** Snapshot compaction (Iceberg rewrite_data_files analog): after
    * many incremental [[appendSnapshot]] commits the live view unions
    * many small snapshot dirs; compact rewrites them as ONE snapshot.
    * Metadata-compatible with rollback — the old dirs stay on disk and
    * the pre-compaction view remains restorable from history. No-op
    * (None) when the view already has a single snapshot.
    */
  def compact(spark: SparkSession): Option[Snapshot] =
    if (snapshots().size <= 1) None
    else readTable(spark).map(replaceWith)

  /** Restore the table to a past snapshot by reinstalling that commit's
    * manifest as the live view (Iceberg rollback analog — the data dirs
    * were never deleted, so this is a metadata-only operation). Ids are
    * never reused, so commits after a rollback keep working; the
    * abandoned branch's dirs stay on disk, referenced only by history.
    */
  def rollbackTo(snapshotId: Long): Unit = {
    val src = historyDir.resolve(s"manifest-$snapshotId.json")
    require(Files.exists(src), s"no snapshot $snapshotId in $historyDir")
    val tmp = Paths.get(root, ".manifest.tmp")
    Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, manifestPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

object TableIO {
  final case class Snapshot(id: Long, dir: String, rows: Long,
                            schema64: String = "")

  /** Resumable run: extract + commit only pages whose url is not yet in
    * the output table. Returns the number of newly committed rows.
    * [[TableIO.pending]]'s two-phase shape keeps page bodies out of the
    * anti-join exchanges.
    */
  def resumeExtract(io: TableIO, pages: Dataset[PageRow], charset: String = "utf-8",
                    numPartitions: Int = 0): Long = {
    val spark = pages.sparkSession
    import spark.implicits._
    val todo = io.pending(pages.toDF(), "url").as[PageRow]
    val extracted = ExtractPipeline.run(todo, charset, numPartitions)
    val snap = io.appendSnapshot(extracted.toDF())
    snap.rows
  }
}
