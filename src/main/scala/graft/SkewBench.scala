package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.WebCorpus
import graft.pipeline.{ExtractPipeline, PageRow, PartitionLineage}

/** Skew evidence run (north rule: "partitioning / shuffle / skew handled
  * explicitly"): the SAME extraction over a deliberately heavy-tailed
  * corpus (every `giantEvery`-th page is ~100x normal size), comparing
  *
  *  - `naive`: classic `repartition(N, hash(url))` into exactly
  *    N = cores partitions (the untuned default) — giants collide into
  *    whichever partition their url hashes to and that one task
  *    straggles while the other cores sit idle;
  *  - `routed`: [[ExtractPipeline.routeForSkew]] at 4N partitions —
  *    fine-grained salt for the body of the distribution, a dedicated
  *    salt range for giant pages, and enough partitions per core that
  *    the scheduler levels the remaining variance dynamically.
  *
  * Prints one JSON line per mode with wall seconds and per-partition
  * max/median task seconds; wall and the straggler ratio (max/median)
  * are the skew headlines.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "20000").toInt
    val giantEvery = sys.env.getOrElse("SPARK_GRAFT_GIANT_EVERY", "2500").toInt
    val giantParas = sys.env.getOrElse("SPARK_GRAFT_GIANT_PARAS", "100000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val inputDir = s"/tmp/graft_skew_pages_${nPages}_${giantEvery}_$giantParas"
    if (!new java.io.File(s"$inputDir/_SUCCESS").exists()) {
      spark.range(nPages.toLong).repartition(64)
        .map(i => WebCorpus.generateOne(i.toInt, giantEvery = giantEvery,
          giantParagraphs = giantParas).page)
        .write.mode("overwrite").parquet(inputDir)
    }
    // both modes read the same parquet and then explicitly repartition,
    // so the partitioning strategy — not scan split granularity — is the
    // only difference between them
    val pages = spark.read.parquet(inputDir).as[PageRow]

    // warm-up (JIT), not timed
    ExtractPipeline.run(
      spark.createDataset((0 until 300).map(WebCorpus.generateOne(_).page)),
      numPartitions = cpus).count()
    spark.read.parquet(inputDir).selectExpr("sum(length(html))").collect() // page cache

    def timed(mode: String, routed: Dataset[PageRow]): Unit = {
      val reps = (1 to 3).map { _ =>
        val acc = spark.sparkContext.collectionAccumulator[PartitionLineage]("lin")
        val t0 = System.nanoTime()
        val n = ExtractPipeline.run(routed, "utf-8", numPartitions = 0, Some(acc)).count()
        val wall = (System.nanoTime() - t0) / 1e9
        (n, wall, acc.value)
      }
      val (n, wall, lin) = reps.minBy(_._2)
      import scala.jdk.CollectionConverters._
      val secs = lin.asScala.map(_.nanos / 1e9).toSeq.sorted
      val mx = if (secs.nonEmpty) secs.last else 0.0
      val md = if (secs.nonEmpty) secs(secs.length / 2) else 0.0
      println(f"""{"metric":"skew_$mode","rows":$n,"wall_sec":$wall%.2f,"partitions":${secs.length},"partition_sec_max":$mx%.2f,"partition_sec_median":$md%.2f,"straggler_ratio":${if (md > 0) mx / md else 0.0}%.1f,"cpus":$cpus}""")
    }

    // naive: one coarse hash straight into N partitions
    val naive = pages.repartition(cpus, col("url")).as[PageRow]
    timed("naive", naive)

    // routed: fine salt + giant segregation at 4 partitions/core (the
    // engine's default shape for heavy-tailed corpora)
    val routed = ExtractPipeline.routeForSkew(pages, cpus * 4, giantThreshold = 1 << 20)
    timed("routed", routed)

    spark.stop()
  }
}
