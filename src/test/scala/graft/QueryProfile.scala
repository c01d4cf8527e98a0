package graft

/** Time one SparkEntry query: `Test/runMain graft.QueryProfile <name> [sfDir] [reps]` */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkTestSession.spark
    val fn = SparkEntry.queries(name)
    @volatile var t0 = 0L
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var record = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          synchronized { if (record) {
            val p = Option(j.properties)
            val site = p.flatMap(pp => Option(pp.getProperty("spark.job.description"))
                .orElse(Option(pp.getProperty("callSite.short")))
                .orElse(Option(pp.getProperty("spark.callSite.short"))))
              .getOrElse(p.map(_.stringPropertyNames().toString).getOrElse("?"))
            events += ((s"start ${j.jobId} [$site]", (System.nanoTime() - t0) / 1e9))
          } }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          synchronized { if (record)
            events += ((s"end   ${j.jobId}", (System.nanoTime() - t0) / 1e9)) }
      })
    (1 to reps).foreach { i =>
      record = i == reps
      t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"QPROF $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    Thread.sleep(300)
    events.foreach { case (e, t) => println(f"QPROFJOB $e at $t%.3f s") }
    spark.stop()
  }
}
