package graft.ops

import graft.fixtures.MstrCorpus
import graft.mstr.MstrPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkEntry surface for the MSTR entity pipeline, run on the
  * deterministic fixture corpus (byte-level goldens live in MstrSpec;
  * the driver records rows-only here since the corpus is not a DuckDB
  * table).
  */
object MstrQueries {
  private def run(spark: SparkSession) =
    MstrPipeline.run(spark, MstrCorpus.pages, "pt-BR", numPartitions = 2)

  def reports(spark: SparkSession): DataFrame = run(spark)._1.toDF()
  def nodes(spark: SparkSession): DataFrame = run(spark)._2.toDF()
  def edges(spark: SparkSession): DataFrame = run(spark)._3.toDF()
  def violations(spark: SparkSession): DataFrame =
    MstrPipeline.validation(spark, MstrCorpus.pages, "pt-BR", numPartitions = 2).toDF()

  /** The unbounded-corpus plan (distributed pages, staged request
    * joins) on the same fixture — byte-equality with the broadcast plan
    * is asserted in MstrJoinSpec; rows-only here.
    */
  def joinPath(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.mstr.MstrJoinPipeline
      .run(spark, spark.createDataset(MstrCorpus.pages).repartition(2), "pt-BR").toDF()
  }
}
