package graft

import org.apache.spark.sql.SparkSession

/** Driver work-list probe (Test/runMain graft.MstrWorklistProbe): the
  * join plan's ONE remaining serial/driver-memory term is the planning
  * parse of the documento index plus the `ReportReq` work list
  * (MstrJoinPipeline stage R). This measures that term in isolation at
  * 1M reports — index html decode + parse, LinkIndex build, work-list
  * build, hot-file detection, and the parallelize+ship of the request
  * RDD — reporting wall seconds and retained driver heap per step, so
  * BASELINE.md can record whether the shape needs distributing.
  *
  * Env knobs: MSTR_GEN_N (reports, default 1000000), MSTR_CORES
  * (default 8).
  */
object MstrWorklistProbe {
  private def usedMb(): Long = {
    val rt = Runtime.getRuntime
    System.gc(); Thread.sleep(200); System.gc()
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MSTR_GEN_N", "1000000").toInt
    val cores = sys.env.getOrElse("MSTR_CORES", "8").toInt
    val loc = graft.mstr.MstrLocale.ptBR

    // the documento index alone, at n links — MstrGen's exact MAINBODY idiom
    val html = (0 until n).iterator
      .map { i =>
        val id = graft.text.TextOps.md5HexUpper(s"gen:rep:$i")
        s"""<a class="MAINBODY" href="GenDoc_${i / 10 + 1}.html#$id">Gen Relatorio $i</a><br>"""
      }
      .mkString("<html><body>", "\n", "</body></html>")
    println(s"PROF index html: n=$n links, ${html.length / (1024 * 1024)} MiB")
    val m0 = usedMb()

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, heap ${usedMb() - m0}%d MiB over baseline")
      r
    }

    val indexes = timed("parse (Soup + LinkIndex)") {
      graft.mstr.MstrPipeline.buildIndexes(Map(loc.documento -> html), loc)
    }
    val work = timed("work list (defaultWork)") {
      graft.mstr.MstrJoinPipeline.defaultWork(indexes.documento, None)
    }
    println(s"PROF work list: ${work.size} requests")
    val hot = timed("hot-file detection") {
      graft.mstr.MstrJoinPipeline.hotFilesOf(
        Seq(indexes.documento.links.iterator.map(_.file),
          work.iterator.map(_.file)), cores)
    }
    println(s"PROF hot files: ${hot.size}")

    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shipped = timed("parallelize + ship + count") {
      spark.sparkContext
        .parallelize(work, math.max(1, math.min(cores, work.size)))
        .map(r => (r.file, r)).count()
    }
    println(s"PROF shipped: $shipped")
    spark.stop()
  }
}
