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
    * the DuckDB oracle's list fold). Implemented as a native codegen'd
    * Catalyst expression ([[graft.functions.VecDot]]): ~50x the
    * interpreted `aggregate(zip_with(...))` form on 64-dim vectors.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for query vectors (vec_id < nQueries),
    * deterministic tiebreak on neighbor id.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 5,
                     nQueries: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    // norms are computed ONCE per vector before the join — the join body
    // then does a single dot per pair (cos = dot / (na*nb) is the exact
    // same float op sequence as the inline form, so oracle-identical)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        norm(col("embedding")).as("qn"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
      norm(col("embedding")).as("cn"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")), 6))
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

  /** Sign-random-projection bucket column over `nPlanes` hyperplanes
    * with plane indices [firstPlane, firstPlane + nPlanes).
    */
  private def srpBucket(nPlanes: Int, firstPlane: Int = 0): Column = {
    val dim = 64
    val planes: Array[Array[Double]] =
      Array.tabulate(nPlanes, dim)((p, j) => planeSign(firstPlane + p, j).toDouble)
    val planesLit = typedLit(planes.map(_.toSeq).toSeq)
    concat((0 until nPlanes).map { p =>
      val proj = dot(col("embedding"), element_at(planesLit, p + 1))
      when(proj >= 0, "1").otherwise("0")
    }: _*)
  }

  /** Bucket key: for each of `nPlanes` hyperplanes, the sign bit of
    * dot(embedding, plane). Vectors in the same bucket are candidate
    * neighbors; exact cosine is computed within buckets only.
    */
  def lshBucketedNeighbors(spark: SparkSession, dir: String,
                           nPlanes: Int = 8, minCos: Double = 0.2): DataFrame = {
    val e = emb(spark, dir)
    val withBucket = e.withColumn("bucket", srpBucket(nPlanes))
      .withColumn("n", norm(col("embedding")))
    val l = withBucket.select(col("bucket"), col("vec_id").as("a"),
      col("embedding").as("va"), col("n").as("na"))
    val r = withBucket.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("vb"), col("n").as("nb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Banded SRP-LSH candidate pairs: `nBands` independent bucket tables
    * of `planesPerBand` planes each; a pair is a candidate if it
    * collides in ANY band (higher recall than one wide bucket, still
    * linear candidate generation — the 10^12-row scale path).
    */
  def bandedSrpPairs(spark: SparkSession, dir: String,
                     nBands: Int = 2, planesPerBand: Int = 4): DataFrame = {
    val e = emb(spark, dir)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"), srpBucket(planesPerBand, b * planesPerBand).as("bucket"))
    }
    val banded = e.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("n"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("vec_id"), col("embedding"), col("n"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("vec_id").as("a"),
      col("embedding").as("va"), col("n").as("na"))
    val r = banded.select(col("band"), col("bucket"), col("vec_id").as("b"),
      col("embedding").as("vb"), col("n").as("nb"))
    // identical subplans on both sides → one ReusedExchange bucket pass
    l.hint("merge").join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("va"), col("vb"), col("na"), col("nb"))
      .dropDuplicates("a", "b")
  }

  /** IVF-style ANN: deterministic coarse centroids (every `centStride`-th
    * vector), each vector assigned to its nearest centroid (one broadcast
    * nested-loop against K centroids — K ≪ corpus, linear cost), queries
    * probe their `nProbe` nearest cells and search exactly within them.
    * At cluster scale the assignment shuffle partitions the corpus by
    * cell, so each probe touches ~nProbe/K of the data.
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
              centStride: Int = 50, nProbe: Int = 2): DataFrame = {
    val e = emb(spark, dir).withColumn("en", norm(col("embedding")))
    val centroids = e.filter(col("vec_id") % centStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"),
        col("en").as("cn"))
    // nearest-centroid assignment (rank 1 per vector, deterministic ties);
    // norms precomputed per side — one dot per (vector, centroid)
    val scoredCells = e.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        round(dot(col("embedding"), col("cvec")) / (col("en") * col("cn")), 6))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    val assigned = scoredCells.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("en"), col("cent_id"))
    // queries probe their nProbe nearest cells
    val probes = scoredCells.filter(col("vec_id") < nQueries)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("en").as("qn"), col("cent_id"))
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos",
        round(dot(col("qvec"), col("embedding")) / (col("qn") * col("en")), 6))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        col("rn").cast("int").as("rn"))
  }
}
