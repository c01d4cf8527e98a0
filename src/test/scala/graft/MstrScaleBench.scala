package graft

import org.apache.spark.sql.SparkSession

/** Broadcast-corpus vs join-based MSTR plan on a generated N-report
  * corpus (Test/runMain graft.MstrScaleBench). Best-of-2 walls each
  * (cache cleared between reps so rep 2 isn't measured under rep 1's
  * cache pressure); asserts both plans return identical row counts.
  * Evidence for BASELINE.md.
  *
  * Env knobs: MSTR_GEN_N (reports, default 1000), MSTR_CORES (local
  * parallelism + shuffle width, default 8), MSTR_PLANS
  * (both|join|broadcast, default both), MSTR_REPS (default 2).
  */
object MstrScaleBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MSTR_GEN_N", "1000").toInt
    val cores = sys.env.getOrElse("MSTR_CORES", "8").toInt
    val plans = sys.env.getOrElse("MSTR_PLANS", "both")
    val reps = sys.env.getOrElse("MSTR_REPS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pages = graft.fixtures.MstrGen.pages(n)
    println(s"PROF corpus: n=$n reports, ${pages.size} pages, " +
      s"${pages.map(_.html.length.toLong).sum / 1024} KiB, cores=$cores")
    def best(tag: String)(f: => Long): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val c = f
        spark.catalog.clearCache() // drop this rep's persisted results
        ((System.nanoTime() - t0) / 1e9, c)
      }
      assert(walls.map(_._2).distinct.size == 1, s"$tag reps disagree: $walls")
      val b = walls.map(_._1).min
      println(f"PROF $tag cores=$cores best=$b%.2f s (${b * 1000 / pages.size}%.3f ms/page, " +
        f"${pages.size / b}%.0f pages/s) walls=${walls.map(w => f"${w._1}%.2f").mkString(",")} rows=${walls.head._2}")
    }
    var nJoin = -1L
    if (plans != "broadcast") best("join") {
      val r = graft.mstr.MstrJoinPipeline.run(spark,
        spark.createDataset(pages).repartition(cores), "pt-BR",
        internalShufflePartitions = cores).count()
      nJoin = r; r
    }
    if (plans != "join") best("broadcast") {
      val r = MstrQueriesScale.broadcastCount(spark, pages, cores)
      if (nJoin >= 0)
        assert(r == nJoin, s"plan cardinality diverged: broadcast=$r join=$nJoin")
      r
    }
    spark.stop()
  }
}

object MstrQueriesScale {
  def broadcastCount(spark: SparkSession, pages: Seq[graft.pipeline.PageRow],
                     cores: Int = 8): Long = {
    val (r, _, _) = graft.mstr.MstrPipeline.run(spark, pages, "pt-BR",
      numPartitions = cores)
    r.count()
  }
}
