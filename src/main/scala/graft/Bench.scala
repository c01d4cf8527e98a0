package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: one JSON line with per-query best-of-N
  * walls, row counts, and rows/sec. A query that throws on ANY rep is
  * listed in `failed` (an intermittent throw can't hide behind a
  * surviving rep); its wall is the best successful rep when one
  * exists, else -1 and excluded from the total — a hard failure can
  * never shadow a regression by logging a fast bogus wall.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // best-of-2 per query: the sandbox VM sees transient CPU steal and
    // the first run pays JIT; the min is the least-polluted measurement
    final case class QueryResult(wall: Double, rows: Long, failed: Boolean,
                                 rowsMismatch: Boolean)
    val results: Map[String, QueryResult] = SparkEntry.queries.map { case (name, fn) =>
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          val rows = fn(spark, sfDir).count()
          Some(((System.nanoTime() - t0) / 1e9, rows))
        } catch { case _: Throwable => None }
      }
      val ok = reps.flatten
      // ANY failed rep flags the query (an intermittent throw must not
      // hide behind a surviving rep); wall still reports the best
      // successful rep when one exists. Successful reps disagreeing on
      // cardinality (a nondeterminism regression) are flagged too, not
      // silently collapsed to the first rep's count.
      name -> (if (ok.isEmpty) QueryResult(-1.0, 0L, failed = true, rowsMismatch = false)
               else QueryResult(ok.map(_._1).min, ok.head._2,
                 failed = ok.size < reps.size,
                 rowsMismatch = ok.map(_._2).distinct.size > 1))
    }
    def jmap(f: QueryResult => String): String =
      results.map { case (k, v) => s"\"$k\":${f(v)}" }.mkString("{", ",", "}")
    val qs = jmap(_.wall.toString)
    val rows = jmap(_.rows.toString)
    val rps = jmap(r => if (r.wall <= 0) "0"
                        else (r.rows / r.wall).round.toString)
    val failed = results.collect { case (k, r) if r.failed => s"\"$k\"" }
      .mkString("[", ",", "]")
    val rowsMismatch = results.collect { case (k, r) if r.rowsMismatch => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.values.map(_.wall).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"rows_per_sec":$rps,"failed":$failed,"rows_mismatch":$rowsMismatch,"sf":"$sfDir"}""")
    spark.stop()
  }
}
