package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `bruteForceTopK`: exact cosine top-k per query via a broadcast
  *    nested-loop join (queries broadcast, corpus streams) — the
  *    correctness baseline;
  *  - `lshBucketedNeighbors`: sign-random-projection buckets (hash
  *    planes derived deterministically from md5, no RNG) — the scale
  *    path: the join is on bucket key, linear not quadratic.
  *
  * Dot products use `aggregate`/`zip_with` higher-order functions —
  * codegen-friendly column expressions, no UDFs.
  */
object SimilarityOps {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Left-to-right double-precision dot product of two float arrays —
    * the fold order is fixed so results are bit-reproducible (and match
    * the DuckDB oracle's list fold).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for query vectors (vec_id < nQueries),
    * deterministic tiebreak on neighbor id.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 5,
                     nQueries: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplane: component j of plane p is
    * +1 if hex digit (j mod 16) of md5("plane:p:" || j/16) is >= '8'
    * else -1. Derived entirely from md5 so the oracle can rebuild it.
    */
  private def planeSign(p: Int, j: Int): Int = {
    // driver-side mirror used by tests; the column form is below
    val block = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane:$p:${j / 16}")
    if (Character.digit(block.charAt(j % 16), 16) >= 8) 1 else -1
  }

  /** Bucket key: for each of `nPlanes` hyperplanes, the sign bit of
    * dot(embedding, plane). Vectors in the same bucket are candidate
    * neighbors; exact cosine is computed within buckets only.
    */
  def lshBucketedNeighbors(spark: SparkSession, dir: String,
                           nPlanes: Int = 8, minCos: Double = 0.2): DataFrame = {
    val e = emb(spark, dir)
    val dim = 64
    val planes: Array[Array[Double]] =
      Array.tabulate(nPlanes, dim)((p, j) => planeSign(p, j).toDouble)
    val planesLit = typedLit(planes.map(_.toSeq).toSeq)
    val withBucket = e.withColumn("bucket",
      concat((0 until nPlanes).map { p =>
        val proj = aggregate(
          zip_with(col("embedding"), element_at(planesLit, p + 1),
            (x, w) => x.cast("double") * w),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, "1").otherwise("0")
      }: _*))
    val l = withBucket.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("va"))
    val r = withBucket.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }
}
