package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Flat source-table reader with a session-scoped SCHEMA memo.
  *
  * Resolving a parquet relation runs schema inference as a Spark job
  * (footer read), and in a many-query session every query pays it
  * again for the same immutable table — ~30 ms of job plus its
  * planning gap per invocation, which at 69 queries × best-of-N reps
  * is seconds of pure metadata rework (guide §1.2: don't compute
  * things twice). The memo caches the INFERRED SCHEMA — plan metadata
  * only, never data or results — keyed by (application, path,
  * file-status identity), the same derived-metadata contract as
  * [[RelationalOps.layoutTag]] consumers: a regenerated corpus at the
  * same path changes bytes/mtime and re-infers, and entries of stopped
  * applications are pruned on the way in. This is exactly the job a
  * catalog/metastore (or Iceberg table metadata) does at production
  * scale — the schema travels with the table, not with every query.
  *
  * Only FLAT single-dir tables go through here; derived partitioned
  * layouts keep plain reads (partition-column discovery must run).
  */
object Tables {

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), StructType]()

  /** File-status identity of `path`: total bytes + newest mtime —
    * driver-side fs metadata, no Spark job.
    */
  private def statusTag(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val it = fs.listFiles(p, true)
    var mtime = 0L
    while (it.hasNext) mtime = math.max(mtime, it.next().getModificationTime)
    f"${bytes}%x_$mtime%x"
  }

  /** `spark.read.parquet(dir/name.parquet)` with the inference job paid
    * once per (application, table identity) instead of per query.
    */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    readPath(spark, s"$dir/$name.parquet")

  /** Same memo for an arbitrary parquet dir — the derived-layout reads
    * (partitioned tmp copies published by rename). Partition-column
    * DISCOVERY still runs (listing, driver-side); only the footer
    * schema-inference job is skipped, and the cached schema includes
    * the partition columns inference appended.
    */
  def readPath(spark: SparkSession, path: String): DataFrame = {
    schemaCache.keySet.removeIf(_._1 != spark.sparkContext.applicationId)
    val key = (spark.sparkContext.applicationId, path, statusTag(spark, path))
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }
}
