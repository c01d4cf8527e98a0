package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.MstrGen
import graft.mstr.{MstrJoinPipeline, MstrPipeline}

/** Scaled-corpus evidence the 2-report fixture can't give: on a
  * generated 30-report export (many sections per file, cross-report
  * metric/dataset reuse, embedded metrics) both physical plans must
  * produce byte-identical JSON, clean integrity, and the expected
  * entity counts.
  */
class MstrGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val N = 30

  test("generated corpus: broadcast and join plans byte-identical, integrity clean") {
    import spark.implicits._
    val pages = MstrGen.pages(N)
    val (reports, nodes, edges) = MstrPipeline.run(spark, pages, "pt-BR", numPartitions = 4)
    val viaBroadcast = reports.collect().map(r => r.report_id -> r.json).toMap
    assert(viaBroadcast.size == N)

    // A10 integrity: no (label, id) with conflicting names at scale
    assert(MstrPipeline.duplicateIdCheck(nodes).count() == 0)

    // summary sanity: every report extracted, entity pools as sized
    val summary = MstrPipeline.summary(nodes, edges).as[(String, Long)].collect().toMap
    assert(summary("Report") == N)
    assert(summary("Environment") == 1)
    assert(summary("User") == 3)
    // every cube references a composite whose children recurse
    assert(summary("COMPOSED_OF") > 0)
    // embedded metrics appear (every 7th cube links a non-indexed id)
    val embedded = nodes.filter(_.extra.startsWith("embedded")).count()
    assert(embedded > 0)

    val viaJoin = MstrJoinPipeline.run(spark,
      spark.createDataset(pages).repartition(8), "pt-BR")
      .collect().map(r => r.report_id -> r.json).toMap
    assert(viaJoin.keySet == viaBroadcast.keySet)
    viaBroadcast.foreach { case (rid, json) =>
      assert(viaJoin(rid) == json, s"report $rid diverged between plans")
    }
  }

  test("en-US locale end-to-end: full extraction on an English export, both plans") {
    import spark.implicits._
    val loc = graft.mstr.MstrLocale.enUS
    val pages = MstrGen.pages(12, loc)
    val (reports, nodes, _) = MstrPipeline.run(spark, pages, "en-US", numPartitions = 3)
    val viaBroadcast = reports.collect().map(r => r.report_id -> r.json).toMap
    assert(viaBroadcast.size == 12)
    assert(MstrPipeline.duplicateIdCheck(nodes).count() == 0)
    // english type labels resolved to canonical tipos
    val metricExtras = nodes.filter(_.label == "Metric").collect().map(_.extra)
    assert(metricExtras.exists(_.startsWith("simples")))
    assert(metricExtras.exists(_.startsWith("composto")))
    // english chart-type row extracted (report_parser.py:389 divergence)
    assert(viaBroadcast.values.exists(_.contains("\"graphic\": \"Vertical Bar\"")))
    val viaJoin = MstrJoinPipeline.run(spark,
      spark.createDataset(pages).repartition(4), "en-US")
      .collect().map(r => r.report_id -> r.json).toMap
    assert(viaJoin == viaBroadcast)
  }

  test("truncation fuzz: both plans agree and never throw, both locales") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (loc <- Seq(graft.mstr.MstrLocale.ptBR, graft.mstr.MstrLocale.enUS)) {
      val corrupted = MstrGen.pages(10, loc).map { p =>
        rnd.nextInt(3) match {
          case 0 => p.copy(html = p.html.take(rnd.nextInt(p.html.length + 1)))
          case 1 => p.copy(html = (new String(p.html, "ISO-8859-1")
            .replace("</table>", "")).getBytes("ISO-8859-1")) // unclosed tables
          case _ => p
        }
      }
      val viaBroadcast = MstrPipeline.run(spark, corrupted, loc.code)._1
        .collect().map(r => r.report_id -> r.json).toMap
      val viaJoin = MstrJoinPipeline.run(spark,
        spark.createDataset(corrupted).repartition(3), loc.code)
        .collect().map(r => r.report_id -> r.json).toMap
      assert(viaJoin == viaBroadcast, s"plans diverged on corrupted ${loc.code} corpus")
    }
  }

  test("generated corpus validation: only the embedded-metric tipo violations") {
    val v = MstrPipeline.validation(spark, MstrGen.pages(N), "pt-BR", 4).collect()
    val errors = v.filter(_.severity == "error")
    // the deliberate embedded metrics are the only schema errors
    assert(errors.nonEmpty && errors.forall(_.rule == "tipo_enum"),
      s"unexpected errors: ${errors.filterNot(_.rule == "tipo_enum").take(5).toSeq}")
  }
}
