package graft

import org.apache.spark.sql.SparkSession

/** Plan audit (Test/runMain graft.PlanAudit): prints the formatted
  * physical plans of representative queries so scan pruning, pushdown,
  * broadcast choices, and exchange reuse can be eyeballed per round.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq(
      "q1_agg", "q_join_agg", "q_lookup_cascade", "q_minhash_lsh",
      "q_ann_lsh", "q_ann_ivf", "q_dedup_first", "q_extract_roundtrip")
    interesting.foreach { name =>
      println(s"\n================ $name ================")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
