package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting. All
  * are pure column expressions (whole-stage codegen, no UDFs) so the
  * scan stays narrow and the formulas are oracle-portable.
  */
object TextAnalysisOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")

  /** Count non-overlapping occurrences of a space-delimited marker via
    * length difference (portable to any SQL engine). Shared with
    * [[CorpusOps.blocklistFilter]].
    */
  private[ops] def markerCount(c: Column, marker: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast("long")

  /** The three stopword scores as pure column expressions over `text` —
    * one definition shared by [[langId]] and the composite filter
    * pipeline (which folds language-ID into the same scan, no join).
    */
  private[ops] def langScores(text: Column): (Column, Column, Column) = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    def score(ws: Seq[String]): Column =
      ws.map(w => markerCount(padded, w)).reduce(_ + _)
    (score(Seq(" the ", " and ", " of ", " is ", " a ")),
      score(Seq(" de ", " que ", " do ", " da ", " em ")),
      score(Seq(" el ", " la ", " los ", " en ", " y ")))
  }

  private[ops] def predictedLangCol(text: Column): Column = {
    val (en, pt, es) = langScores(text)
    when(en >= pt && en >= es, "en").when(pt >= es, "pt").otherwise("es")
  }

  /** n-gram / stopword language-ID heuristic. Scores a handful of
    * high-frequency function words per language over the padded text;
    * argmax wins with a deterministic precedence order.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val (en, pt, es) = langScores(col("text"))
    d.select(col("doc_id"),
      en.as("en_score"), pt.as("pt_score"), es.as("es_score"))
      .withColumn("predicted_lang",
        when(col("en_score") >= col("pt_score") && col("en_score") >= col("es_score"), "en")
          .when(col("pt_score") >= col("es_score"), "pt")
          .otherwise("es"))
  }

  /** Language-ID evaluation: confusion counts of the n-gram predictor
    * against the corpus's `lang` label (prediction from P(2.8)-style
    * heuristics; the label set is wider than the predictor's — non-
    * {en,pt,es} labels measure the open-set error rate).
    *
    * ONE scan: prediction and label come off the same documents row, so
    * the confusion matrix is a single map-side-combinable aggregation —
    * the previous self-join of [[langId]]'s output back against the
    * table re-scanned the corpus and shuffled it through a doc_id join
    * for columns that were row-local all along (guide §2.4: remove
    * shuffles outright).
    */
  def langIdAccuracy(spark: SparkSession, dir: String): DataFrame =
    // spread before the 15-marker scoring pass (Par.spread, guide §2.5):
    // the regex counting is the per-row cost and a single-file corpus
    // scans as one split (no-op at production split counts)
    Par.spread(docs(spark, dir), dir)
      .select(col("lang"), predictedLangCol(col("text")).as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))

  /** quality_ok as a pure column expression over `text` — shared by
    * [[qualityScore]] and the composite filter pipeline. Thresholds on
    * the ROUNDED mean word length, identical to the emitted column.
    */
  private[ops] def qualityOkCol(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = size(split(text, " ")).cast("double")
    val mwl = round(nChars / nWords, 4)
    (nWords.cast("long") >= 10) && (mwl >= 2.5) && (mwl <= 12.0)
  }

  /** Quality scoring: length, word stats, stopword ratio, punctuation
    * ratio — a FineWeb/C4-style filter signal set.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val text = col("text")
    val nChars = length(text).cast("double")
    val nWords = size(split(text, " ")).cast("double")
    val padded = concat(lit(" "), lower(text), lit(" "))
    val stopHits = Seq(" the ", " a ", " and ", " of ", " to ", " in ")
      .map(w => markerCount(padded, w)).reduce(_ + _).cast("double")
    val nPunct = (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    d.select(col("doc_id"),
      nChars.cast("long").as("n_chars_m"),
      nWords.cast("long").as("n_words"),
      round(nChars / nWords, 4).as("mean_word_len"),
      round(stopHits / nWords, 4).as("stopword_ratio"),
      round(nPunct / nChars, 4).as("punct_ratio"))
      .withColumn("quality_ok",
        (col("n_words") >= 10) && (col("mean_word_len") >= 2.5) &&
          (col("mean_word_len") <= 12.0))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digits / single punctuation marks).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    d.select(col("doc_id"),
      size(split(trim(col("text")), " +")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("re_tokens"))
  }

  /** Document fingerprint: md5 of the case-folded, whitespace-collapsed,
    * punctuation-stripped text (the normalize-then-hash half of exact
    * near-dup pipelines).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val norm = trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    d.select(col("doc_id"), md5(norm).as("fingerprint"))
  }

  /** Unigram cross-entropy quality score (the KenLM-shaped perplexity
    * filter of CCNet/RefinedWeb, with the corpus itself as the LM):
    * pass 1 aggregates corpus unigram counts, pass 2 scores each
    * document as H(doc) = -(1/n) Σ ln p(w), p(w) = count(w)/total.
    * Low H ⇒ stereotyped/boilerplate text, high H ⇒ rare-token noise —
    * both tails are what perplexity filters cut.
    *
    * Scale shape: the vocabulary aggregation is one map-side-combinable
    * shuffle; the (doc, word) counts join the vocabulary on the word
    * key (a real LM's vocab is bounded, so the count side broadcasts);
    * the scalar total rides a broadcast cross join. Determinism: each
    * term rounds ln p to 9 dp and accumulates in DECIMAL, so shuffle
    * row order cannot move the rounded score (double addition is not
    * associative; decimal addition is).
    */
  def unigramXent(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan: vocabulary counts roll up from the per-doc
    // aggregation instead of re-exploding the token stream.
    // NO Par.spread (r6 A/B, 0.35/0.43 s vs 0.42/0.63 s across two calm
    // sessions at sf0.1/32c): the explode feeds a map-side partial
    // aggregation whose exchange both branches reuse — a spread adds a
    // raw-row exchange upstream of the shared subtree and delays every
    // stage behind it (guide §2.3)
    val perDoc = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cwd"))
    val counts = perDoc.groupBy(col("w")).agg(sum(col("cwd")).as("cw"))
    val total = counts.agg(sum(col("cw")).as("tt"))
    // broadcast FORCED, not threshold-carried (verdict r5 nit 3): the
    // word key is Zipf-skewed, so a sort-merge fallback on a mature
    // corpus would shuffle the Zipf head through one partition; a real
    // LM's vocab is bounded, so the count side always broadcasts
    perDoc.join(broadcast(counts), "w")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("cwd"),
        (col("cwd").cast("decimal(10,0)") *
          round(log(col("cw") / col("tt")), 9).cast("decimal(18,9)")).as("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cwd")).as("n_tokens"),
        round((-sum(col("term"))).cast("double") / sum(col("cwd")), 6).as("xent"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("xent"))
  }

  /** DSIR-style importance score (Data Selection via Importance
    * Resampling, Xie et al. 2023): documents are scored by the
    * log-likelihood RATIO of a target-distribution unigram LM over the
    * raw-corpus unigram LM, computed on HASHED features — the
    * domain-adaptation selector that upweights documents resembling a
    * curated target set. The target here is the corpus' `lang = 'en'`
    * stratum (a deterministic subset standing in for the curated
    * target); features are tokens hashed into 256 buckets (the first 2
    * hex chars of md5("dsir:" || token) — bucket ids stay strings, so
    * any md5-capable engine agrees without hex→int conversion).
    *
    * score(d) = (1/n) Σ_b c_d(b) · [ln p̂_t(b) − ln p̂_r(b)], with
    * add-one smoothing p̂(b) = (c(b)+1)/(T+256). Positive ⇒ looks more
    * like the target than the raw corpus.
    *
    * Scale shape: one corpus scan feeds the per-doc bucket counts; BOTH
    * LMs roll up from those counts in a single map-side-combinable
    * aggregation (the target LM as a conditional sum over the same
    * groupBy); the weight table is ≤256 rows — broadcast — so per-doc
    * scoring is one broadcast join away from map-only.
    * Determinism: per-bucket weights round ln to 9 dp and the per-doc
    * sum accumulates in DECIMAL (the [[unigramXent]] contract), so
    * shuffle order cannot move the rounded score.
    */
  def dsirScore(spark: SparkSession, dir: String): DataFrame = {
    val nBuckets = 256
    // NO Par.spread (r6 pass-4 A/B, two sessions: 0.466/0.398 s unspread
    // vs 0.576/0.439 s spread at sf0.1/32c, and the spread run was far
    // noisier rep-to-rep): the explode feeds a map-side partial
    // aggregation whose exchange both LM legs reuse — the same mechanism
    // that reversed the q1_agg-class spreads (guide §2.3); pass 1 had
    // scored it a wash and kept it, the calm re-measure says remove
    val perDoc = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("lang"),
        substring(md5(concat(lit("dsir:"), col("w"))), 1, 2).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
    // ONE bucket aggregation builds BOTH LMs: the raw count and the
    // target (lang = 'en') count ride the same groupBy via a
    // conditional sum — sum(when) yields NULL exactly where the old
    // raw-LEFT-JOIN-tgt produced a null ct (no target rows in the
    // bucket), so the smoothing arithmetic is unchanged. The previous
    // two-branch form re-derived the perDoc explode+aggregation subtree
    // per LM (guide §2.4: share one exchange instead of re-computing).
    val buckets = perDoc.groupBy(col("b")).agg(
      sum(col("c")).as("cr"),
      sum(when(col("lang") === "en", col("c"))).as("ct"))
    val totals = buckets.agg(sum(col("cr")).as("tr"),
      coalesce(sum(col("ct")), lit(0L)).as("tt"))
    val weights = buckets
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round(
          log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + nBuckets)) -
            log((col("cr") + 1.0) / (col("tr") + nBuckets)),
          9).cast("decimal(18,9)").as("wgt"))
    perDoc.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        round((sum(col("c").cast("decimal(10,0)") * col("wgt"))).cast("double")
          / sum(col("c")), 6).as("dsir_score"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("dsir_score"))
  }

  /** The fixed benchmark query set for [[bm25TopK]] — literal on both
    * the Spark and oracle sides.
    */
  final val Bm25Queries: Seq[(Int, String)] = Seq(
    0 -> "table", 0 -> "scan",
    1 -> "hash", 1 -> "join", 1 -> "fast",
    2 -> "window", 2 -> "agg",
    3 -> "vector", 3 -> "merge",
    4 -> "customer", 4 -> "order", 4 -> "query")

  /** BM25 ranked retrieval (Robertson k1=1.2, b=0.75, the +1 idf
    * variant): top-10 documents per query over whitespace tokens.
    *
    * Scale shape: the token ARRAY is filtered to the literal query
    * terms before the explode, so Generate emits only matching
    * postings and tf/df work is proportional to matches, not the
    * corpus (a post-explode join would materialize the n·len token
    * stream first); document
    * lengths ride the same scan; N and avgdl are broadcast scalars; the
    * per-query top-k is a rank-filter window (WindowGroupLimit pushes
    * the limit below the sort). Per-term scores round to 9 dp and
    * accumulate in DECIMAL so shuffle order cannot move the rounded
    * total.
    */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val k1 = 1.2
    val b = 0.75
    val queries = broadcast(Bm25Queries.toDF("query_id", "term"))
    // NO Par.spread (r6 pass-4 A/B, two sessions: 0.597/0.439 s unspread
    // vs 0.687/0.513 s spread at sf0.1/32c — the pass-1 reading that the
    // spread paid here did not survive re-measurement): the pre-explode
    // term filter leaves ~hits rows, so the per-row work after the scan
    // is light and the tf aggregation collapses map-side — the shared
    // spread exchange delayed both legs more than the parallelism bought
    val d = docs(spark, dir).select(col("doc_id"),
      split(col("text"), " ").as("toks"))
    val lens = d.select(col("doc_id"), size(col("toks")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // postings restricted to query terms BEFORE the explode: the
    // row-local array filter means Generate emits only matching
    // postings (~hits), never the corpus token stream (~n·len rows
    // materialized then discarded by a post-explode join)
    val termSet = Bm25Queries.map(_._2).distinct
    // dl rides the posting row (functionally dependent on doc_id, so
    // the tf groupBy result is unchanged): one extra int per MATCHING
    // posting instead of a corpus-wide lens join — the old shape
    // exchanged the whole doc-length table on doc_id to re-attach a
    // value the scan already had row-locally (guide §2.4)
    val toks = d.select(col("doc_id"), size(col("toks")).as("dl"),
        explode(filter(col("toks"), t => t.isInCollection(termSet))).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // df is ≤ |distinct query terms| rows — broadcast it so the tf side
    // never re-shuffles on the Zipf-skewed word key (guide §3.1)
    tf.join(broadcast(df), "w")
      .crossJoin(broadcast(stats))
      .join(queries, col("w") === col("term"))
      .select(col("query_id"), col("doc_id"),
        round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))),
          9).cast("decimal(18,9)").as("term_score"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("term_score")).cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }
}
