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
    val starts = scala.collection.mutable.Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts(j.jobId) = System.nanoTime(); jobs += 1
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val w = (System.nanoTime() - starts.getOrElse(j.jobId, System.nanoTime())) / 1e9
        if (w > 0.2) println(f"PROFJOB ${j.jobId} $w%.2f s")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.mstr.MstrJoinPipeline.run(spark,
      spark.createDataset(graft.fixtures.MstrCorpus.pages).repartition(2)).count()
    Thread.sleep(500)
    println(f"PROF total ${(System.nanoTime()-t0)/1e9}%.2f s jobs=$jobs")
    spark.stop()
  }
}
