package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hardware-ceiling control for the dedup-family scaling numbers
  * ([[DedupScaleBench]]): the SAME shuffle shape the first-wins pass
  * pays — N (md5-hex, long) rows through a hash exchange into a
  * map-side-combinable min aggregation — with NO operator logic
  * around it. Run at two parallelism levels in separate JVMs
  * (SPARK_GRAFT_CPUS=2 then 8); the resulting N→4N efficiency is the
  * BOX's shuffle-scaling ceiling: all local[k] threads share one
  * memory subsystem, so a bandwidth-bound stage cannot scale past
  * this no matter how clean the plan. Comparing an operator's
  * efficiency to this control separates "the plan has a serial term"
  * (operator ≪ control) from "the box ran out of memory channels"
  * (operator ≈ control) — on a real multi-executor cluster each node
  * adds its own channels, so the control's ceiling lifts with the
  * cluster while a plan-serial term would not.
  *
  * Rows default to 30M ≈ a quarter of DedupScaleBench's occurrence
  * volume at 1M docs — enough to be firmly bandwidth-bound while
  * keeping the 2-core leg's best-of-reps under ~10 minutes.
  *
  * Prints ONE JSON line: rows, wall seconds, rows/sec, reps.
  */
object ShuffleFloorBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nRows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "30000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-shuffle-floor-bench")
      // fixed across levels — sized to the data, see DedupScaleBench
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the first-wins shuffle shape: (md5 key, long ord) → min per key;
    // sum(length(keep)) forces the aggregation output like the dedup
    // drains force the digest
    def job(): Unit =
      spark.range(nRows)
        .select(md5(col("id").cast("string")).as("h"), col("id").as("ord"))
        .groupBy(col("h")).agg(min(col("ord")).as("keep"))
        .agg(count(lit(1)), sum(col("keep"))).collect()

    job() // warm-up (JIT/codegen), not timed
    val wall = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      job()
      (System.nanoTime() - t0) / 1e9
    }.min
    val rate = nRows / wall
    println(f"""{"bench":"shuffle_floor","cpus":$cpus,"rows":$nRows,"wall_s":$wall%.2f,"rows_per_s":$rate%.0f,"reps":$reps}""")
    spark.stop()
  }
}
