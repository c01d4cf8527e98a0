package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query benchmark for optimization work (guide §1.4): the
  * SAME session shape and timing methodology as the frozen
  * [[graft.Bench]] (master/shuffle partitions from `SPARK_GRAFT_CPUS`,
  * data dir from `SPARK_GRAFT_SF_DIR`, `df.count()` as the action) but
  * over a caller-chosen query subset with a caller-chosen rep count,
  * printing every rep so floors and steal spikes are visible.
  * Usage: `runMain graft.BenchExtra <query>[,<query>...] [reps]`.
  * This main is measurement-only tooling; the driver's numbers come
  * from the untouched [[graft.Bench]].
  */
object BenchExtra {
  import org.apache.spark.sql.{DataFrame, functions => F}

  /** Experimental plan variants, A/B-able against the declared queries
    * without touching `SparkEntry.queries` (never benched by the
    * driver, never oracle-compared).
    */
  private val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q1_agg without the Par.spread: partial agg rides the single-split
    // scan, only ~6 partial rows cross the exchange (guide §2.3)
    "x_q1_nospread" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy(F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(
          F.sum(F.col("l_quantity")).cast("double").as("sum_qty"),
          F.round(F.sum(F.col("l_extendedprice")), 2).as("sum_base_price"),
          F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2)
            .as("sum_disc_price"),
          F.count(F.lit(1)).as("count_order"))),
    // q_summary_counts without the spread
    "x_summary_nospread" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      val p = s.read.parquet(s"$d/part.parquet")
      li.agg(
        F.countDistinct(F.col("l_orderkey")).as("n_orders_ref"),
        F.countDistinct(F.col("l_partkey")).as("n_parts_ref"),
        F.count(F.lit(1)).as("n_lineitems"))
        .crossJoin(o.agg(F.countDistinct(F.col("o_custkey")).as("n_customers_ref")))
        .crossJoin(c.agg(F.count(F.lit(1)).as("n_customers")))
        .crossJoin(p.agg(F.count(F.lit(1)).as("n_parts")))
        .select("n_orders_ref", "n_parts_ref", "n_lineitems", "n_customers_ref",
          "n_customers", "n_parts")
    }),
    // q_dup_id_check without the spread
    "x_dupid_nospread" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy(F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).as("cnt"))
        .filter(F.col("cnt") > 1)),
    // q_lookup_cascade without the spread
    "x_lookup_nospread" -> ((s, d) => {
      val ev = s.read.parquet(s"$d/events.parquet")
      val cust = s.read.parquet(s"$d/customer.parquet")
        .select(F.col("c_custkey").as("key"), F.col("c_name").as("cust_name"))
      val supp = s.read.parquet(s"$d/supplier.parquet")
        .select(F.col("s_suppkey").as("skey"), F.col("s_name").as("supp_name"))
      ev.join(F.broadcast(cust), ev("user_id") === cust("key"), "left")
        .join(F.broadcast(supp), ev("user_id") === supp("skey"), "left")
        .select(F.col("event_id"),
          F.coalesce(F.col("cust_name"), F.col("supp_name"), F.lit("unresolved"))
            .as("resolved_name"),
          F.when(F.col("cust_name").isNotNull, "customer")
            .when(F.col("supp_name").isNotNull, "supplier")
            .otherwise("none").as("match_source"))
    }),
    // q_join_agg without the probe-side spread
    "x_joinagg_nospread" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      val n = s.read.parquet(s"$d/nation.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(F.broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(F.broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(F.col("n_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2)
          .as("revenue"),
          F.count(F.lit(1)).as("n_items"))
    })
  )

  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty || args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = variants.getOrElse(name, SparkEntry.queries(name))
      val walls = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"XBENCH $name rep$i $w%.3f s rows=$rows")
        w
      }
      println(f"XBENCH $name min ${walls.min}%.3f s")
    }
    spark.stop()
  }
}
