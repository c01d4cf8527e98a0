package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe (not a test suite member — run via Test/runMain). */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // warm
    ops.ExtractOps.roundtrip(spark, dir).count()
    ops.ExtractOps.roundtripExpr(spark, dir).count()

    time("roundtrip     ")(ops.ExtractOps.roundtrip(spark, dir).count())
    time("roundtripExpr ")(ops.ExtractOps.roundtripExpr(spark, dir).count())
    time("pagesOnly     ")(ops.ExtractOps.documentsAsPages(spark, dir).count())

    ops.ExtractOps.roundtripExpr(spark, dir).explain("formatted")
    spark.stop()
  }
}
