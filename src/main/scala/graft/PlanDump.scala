package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling (guide §1.3/§7.2): dump
  * `.explain("formatted")` for every declared query to
  * `plans/<tag>/<query>_<suffix>.txt` so plan claims are checkable
  * without running Spark. Not part of the frozen bench contract —
  * measurement stays in [[Bench]].
  *
  * Args: [outDir] [suffix] [queryCsv]
  *  - outDir   default plans/r06
  *  - suffix   default "before"
  *  - queryCsv optional comma-separated subset of query names
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r06"
    val suffix = if (args.length > 1) args(1) else "before"
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    queries.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"plan: $name")
      val out = new java.io.File(outDir, s"${name}_$suffix.txt")
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(out, "UTF-8")
        try w.println(plan) finally w.close()
        println(s"WROTE $out")
      } catch {
        case e: Throwable =>
          println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
