package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.WebCorpus
import graft.streaming.StreamingExtract

class StreamingAndOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming AvailableNow: incremental extraction with exactly-once resume") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    val fixtures = WebCorpus.generate(40)

    // batch 1: first 20 pages
    spark.createDataset(fixtures.take(20).map(_.page))
      .write.mode("append").parquet(src)
    StreamingExtract.runAvailableNow(spark, src, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 20)

    // batch 2: 20 more files arrive; only they are processed
    spark.createDataset(fixtures.drop(20).map(_.page))
      .write.mode("append").parquet(src)
    StreamingExtract.runAvailableNow(spark, src, sink, ckpt)
    val out = spark.read.parquet(sink)
    assert(out.count() == 40) // no reprocessing of batch 1

    // byte-identical to goldens
    val got = out.select("url", "text").as[(String, String)].collect().toMap
    fixtures.foreach(f => assert(got(f.page.url) == f.expectedText, f.page.url))
  }

  test("flatMapGroupsWithState dedup: repeated urls suppressed across micro-batches") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    val fixtures = WebCorpus.generate(12)

    // batch 1: 8 pages, two of them written twice (in-batch dups)
    spark.createDataset((fixtures.take(8) ++ fixtures.slice(0, 2)).map(_.page))
      .write.mode("append").parquet(src)
    StreamingExtract.runDedupAvailableNow(spark, src, sink, ckpt)
    assert(spark.read.parquet(sink).count() == 8) // in-batch dups suppressed

    // batch 2: 4 new pages + 3 re-crawls of batch-1 urls
    spark.createDataset((fixtures.drop(8) ++ fixtures.slice(2, 5)).map(_.page))
      .write.mode("append").parquet(src)
    StreamingExtract.runDedupAvailableNow(spark, src, sink, ckpt)
    val out = spark.read.parquet(sink)
    assert(out.count() == 12) // cross-batch recrawls suppressed via state
    assert(out.select("url").distinct().count() == 12)
  }

  test("extract_main_text expression: Column and SQL surfaces agree with pipeline") {
    import spark.implicits._
    val fixtures = WebCorpus.generate(10)
    val df = spark.createDataset(fixtures.map(_.page)).toDF()
    // Column surface
    val viaCol = df.select(col("url"),
      graft.functions.GraftFunctions.extract_main_text(col("html"), lit("utf-8")).as("text"))
      .as[(String, String)].collect().toMap
    fixtures.foreach(f => assert(viaCol(f.page.url) == f.expectedText))
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("pages_v")
    val viaSql = spark.sql(
      "SELECT url, extract_main_text(html, 'utf-8') AS text FROM pages_v")
      .as[(String, String)].collect().toMap
    fixtures.foreach(f => assert(viaSql(f.page.url) == f.expectedText))
    // normalizer expression parity
    val n = spark.sql("SELECT normalize_for_comparison('EXPRESSÃO') AS x")
      .as[String].collect().head
    assert(n == "EXPRESSAO")
  }

  test("multimodal: decode stub features + frame sampling are deterministic") {
    import spark.implicits._
    val feats = graft.ops.MultimodalOps.decodeQuery(spark, "/root/testdata/sf0.001")
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(feats.filter(col("width") < 16 || col("width") > 31).count() == 0)
    val frames = graft.ops.MultimodalOps.framesQuery(spark, "/root/testdata/sf0.001")
    // only video rows produce frames; idempotent across runs
    val a = frames.collect().map(_.toString).sorted
    val b = graft.ops.MultimodalOps.framesQuery(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("streaming windowed metrics query runs on the pages stream") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    spark.createDataset(WebCorpus.generate(30).map(_.page))
      .write.mode("overwrite").parquet(s"$base/src")
    val pages = spark.readStream.schema(StreamingExtract.pageSchema)
      .parquet(s"$base/src").as[graft.pipeline.PageRow]
    val q = StreamingExtract.metricsQuery(pages)
      .writeStream.format("memory").queryName("page_metrics")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val res = spark.sql("SELECT sum(docs) FROM page_metrics").as[Long].collect().head
    assert(res == 30)
  }
}
