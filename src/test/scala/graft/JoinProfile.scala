package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
object JoinProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // warm
    graft.mstr.MstrJoinPipeline.run(spark,
      spark.createDataset(graft.fixtures.MstrCorpus.pages).repartition(2)).count()
    var jobs = 0
    @volatile var t0 = 0L
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        jobs += 1
        val site = j.stageInfos.map(s => s.name.takeWhile(_ != '\n')).mkString(" | ")
        events += ((s"start ${j.jobId} [$site]", (System.nanoTime() - t0) / 1e9))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        events += ((s"end   ${j.jobId}", (System.nanoTime() - t0) / 1e9))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t0 = System.nanoTime()
    graft.mstr.MstrJoinPipeline.run(spark,
      spark.createDataset(graft.fixtures.MstrCorpus.pages).repartition(2)).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    events.foreach { case (e, t) => println(f"PROFJOB $e at $t%.3f s") }
    println(f"PROF total $total%.2f s jobs=$jobs")
    spark.stop()
  }
}
