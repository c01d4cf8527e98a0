package graft

import org.apache.spark.sql.SparkSession

/** Broadcast-corpus vs join-based MSTR plan on a generated N-report
  * corpus (Test/runMain graft.MstrScaleBench). Best-of-2 walls each
  * (cache cleared between reps so rep 2 isn't measured under rep 1's
  * cache pressure); asserts both plans return identical row counts.
  * Evidence for BASELINE.md.
  */
object MstrScaleBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MSTR_GEN_N", "1000").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pages = graft.fixtures.MstrGen.pages(n)
    println(s"PROF corpus: ${pages.size} pages, ${pages.map(_.html.length).sum / 1024} KiB")
    def best(tag: String)(f: => Long): Long = {
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val c = f
        spark.catalog.clearCache() // drop this rep's persisted results
        ((System.nanoTime() - t0) / 1e9, c)
      }
      assert(walls.map(_._2).distinct.size == 1, s"$tag reps disagree: $walls")
      println(f"PROF $tag best=${walls.map(_._1).min}%.2f s walls=${walls.map(w => f"${w._1}%.2f").mkString(",")} rows=${walls.head._2}")
      walls.head._2
    }
    val nBroadcast = best("broadcast") {
      MstrQueriesScale.broadcastCount(spark, pages)
    }
    val nJoin = best("join") {
      graft.mstr.MstrJoinPipeline.run(spark,
        spark.createDataset(pages).repartition(8), "pt-BR",
        internalShufflePartitions = 8).count()
    }
    assert(nBroadcast == nJoin, s"plan cardinality diverged: $nBroadcast vs $nJoin")
    println(s"PROF plans agree: $nJoin reports")
    spark.stop()
  }
}

object MstrQueriesScale {
  def broadcastCount(spark: SparkSession, pages: Seq[graft.pipeline.PageRow]): Long = {
    val (r, _, _) = graft.mstr.MstrPipeline.run(spark, pages, "pt-BR", numPartitions = 8)
    r.count()
  }
}
