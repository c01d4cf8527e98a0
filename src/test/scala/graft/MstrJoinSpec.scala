package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.MstrCorpus
import graft.mstr.{MstrJoinPipeline, MstrPipeline}

/** The join-based plan (unbounded-corpus path: distributed pages,
  * staged request joins) must produce byte-identical report JSON to the
  * broadcast-corpus plan — same parsers, different physical strategy.
  */
class MstrJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join path equals broadcast path byte-for-byte on the fixture corpus") {
    import spark.implicits._
    val viaBroadcast = MstrPipeline.run(spark, MstrCorpus.pages, "pt-BR")._1
      .collect().map(r => r.report_id -> r.json).toMap

    // distributed pages, deliberately spread over several partitions
    val pagesDs = spark.createDataset(MstrCorpus.pages).repartition(5)
    val viaJoin = MstrJoinPipeline.run(spark, pagesDs, "pt-BR")
      .collect().map(r => r.report_id -> r.json).toMap

    assert(viaJoin.keySet == viaBroadcast.keySet)
    viaBroadcast.foreach { case (rid, json) =>
      assert(viaJoin(rid) == json, s"report $rid diverged between paths")
    }
  }

  test("join path never throws on truncated pages and is partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corrupted = MstrCorpus.pages.map { p =>
      if (rnd.nextBoolean()) p.copy(html = p.html.take(rnd.nextInt(p.html.length + 1)))
      else p
    }
    def run(parts: Int): Map[String, String] =
      MstrJoinPipeline.run(spark, spark.createDataset(corrupted).repartition(parts), "pt-BR")
        .collect().map(r => r.report_id -> r.json).toMap
    val a = run(1)
    val b = run(7)
    assert(a == b, "corrupted-corpus extraction must be partition-invariant")
  }

  test("duplicate base names resolve by greatest url in BOTH plans (byte-identical)") {
    import spark.implicits._
    // shadow every content page with an earlier-url garbage twin: the
    // greatest-url rule must pick the real page in both plans
    val shadowed = MstrCorpus.pages.flatMap { p =>
      val name = p.url.substring(p.url.lastIndexOf('/') + 1)
      Seq(p.copy(url = s"mstr://aaa/$name",
        html = "<html>junk twin</html>".getBytes("ISO-8859-1")), p)
    }
    val viaBroadcast = MstrPipeline.run(spark, shadowed, "pt-BR")._1
      .collect().map(r => r.report_id -> r.json).toMap
    val clean = MstrPipeline.run(spark, MstrCorpus.pages, "pt-BR")._1
      .collect().map(r => r.report_id -> r.json).toMap
    assert(viaBroadcast == clean, "broadcast plan must keep the greatest-url page")
    val viaJoin = MstrJoinPipeline.run(spark,
      spark.createDataset(shadowed).repartition(4), "pt-BR")
      .collect().map(r => r.report_id -> r.json).toMap
    assert(viaJoin == clean, "join plan must keep the greatest-url page")
  }

  test("mass-duplicated basenames stay correct (dedup is always distributed)") {
    import spark.implicits._
    // every content page shadowed => every basename is duplicated; the
    // greatest-url rule rides the basename layout's reduceByKey, so no
    // duplication cardinality ever materializes a driver-side dup set —
    // output must be byte-identical to the clean broadcast run
    val shadowed = MstrCorpus.pages.flatMap { p =>
      val name = p.url.substring(p.url.lastIndexOf('/') + 1)
      Seq(p.copy(url = s"mstr://aaa/$name",
        html = "<html>junk twin</html>".getBytes("ISO-8859-1")), p)
    }
    val clean = MstrPipeline.run(spark, MstrCorpus.pages, "pt-BR")._1
      .collect().map(r => r.report_id -> r.json).toMap
    val viaJoin = MstrJoinPipeline.run(spark,
      spark.createDataset(shadowed).repartition(4), "pt-BR")
      .collect().map(r => r.report_id -> r.json).toMap
    assert(viaJoin == clean,
      "distributed-dedup path must keep the greatest-url page for every basename")
  }

  test("join path drops reports whose content page is missing (engine None semantics)") {
    import spark.implicits._
    val docFile = graft.mstr.MstrLocale.ptBR.documento
    // remove every content page except the index files: no report
    // assembles, but index-only planning still works
    val indexOnly = MstrCorpus.pages.filter { p =>
      val f = p.url.substring(p.url.lastIndexOf('/') + 1)
      f == docFile || f.endsWith(".html") && !f.startsWith("Documento_")
    }
    val out = MstrJoinPipeline.run(spark, spark.createDataset(indexOnly), "pt-BR")
    assert(out.collect().isEmpty)
  }
}
