package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — queries + DuckDB oracle SQL (see SURVEY.md §7).
  *
  * Every query is a Spark DataFrame program (broadcast joins, window
  * ranks, higher-order array functions — no UDFs in any hot path); the
  * oracle re-states the same semantics in portable SQL. All hash/ID
  * derivations are md5-based so both engines compute identical values.
  */
object SparkEntry {

  /** Flagship: byte-identity extraction roundtrip on sf0.001 — wrap
    * every document in boilerplate HTML, run the full tokenize →
    * tag-tree → block-classification pipeline, return per-doc text.
    */
  def entry(spark: SparkSession): DataFrame =
    ExtractOps.roundtrip(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction core (north star) ----
    "q_extract_roundtrip" -> ((s, d) => ExtractOps.roundtrip(s, d)),
    "q_extract_expr" -> ((s, d) => ExtractOps.roundtripExpr(s, d)),
    "q_pdf_roundtrip" -> ((s, d) => ExtractOps.pdfRoundtrip(s, d)),
    "q_extract_spans" -> ((s, d) => ExtractOps.spansRoundtrip(s, d)),
    "q_corpus_stats" -> ((s, d) => ExtractOps.corpusStats(s, d)),
    "q_web_pipeline" -> ((s, _) => ExtractOps.webCorpus(s, 300, 32)),
    // ---- multimodal binary columns (real PNG/WAV/AVI codecs) ----
    "q_media_decode" -> ((s, d) => MultimodalOps.decodeQuery(s, d)),
    "q_media_frames" -> ((s, d) => MultimodalOps.framesQuery(s, d)),
    "q_media_image" -> ((s, d) => MultimodalOps.imageDecodeQuery(s, d)),
    "q_media_resize" -> ((s, d) => MultimodalOps.imageResizeQuery(s, d)),
    "q_media_audio" -> ((s, d) => MultimodalOps.audioDecodeQuery(s, d)),
    "q_media_video" -> ((s, d) => MultimodalOps.videoDecodeQuery(s, d)),
    // ---- MSTR entity pipeline on the deterministic fixture corpus ----
    // (byte-identity asserted in MstrSpec; here rows-only sanity)
    "q_mstr_reports" -> ((s, _) => MstrQueries.reports(s)),
    "q_mstr_nodes" -> ((s, _) => MstrQueries.nodes(s)),
    "q_mstr_edges" -> ((s, _) => MstrQueries.edges(s)),
    "q_mstr_validate" -> ((s, _) => MstrQueries.violations(s)),
    "q_mstr_join" -> ((s, _) => MstrQueries.joinPath(s)),
    // ---- reference relational operators (SURVEY.md §2) ----
    "q1_agg" -> ((s, d) => RelationalOps.q1Agg(s, d)),
    "q_join_agg" -> ((s, d) => RelationalOps.joinAgg(s, d)),
    "q_bucketed_join" -> ((s, d) => RelationalOps.bucketedJoinAgg(s, d)),
    "q_partition_prune" -> ((s, d) => RelationalOps.partitionPrunedAgg(s, d)),
    "q_summary_counts" -> ((s, d) => RelationalOps.summaryCounts(s, d)),
    "q_dup_id_check" -> ((s, d) => RelationalOps.duplicateIdCheck(s, d)),
    "q_filter_ci" -> ((s, d) => RelationalOps.filterCi(s, d)),
    "q_regex_extract" -> ((s, d) => RelationalOps.regexExtract(s, d)),
    "q_href_split" -> ((s, d) => RelationalOps.hrefSplit(s, d)),
    "q_md5_form_id" -> ((s, d) => RelationalOps.md5FormId(s, d)),
    "q_lookup_cascade" -> ((s, d) => RelationalOps.lookupCascade(s, d)),
    "q_validate" -> ((s, d) => RelationalOps.validateEntities(s, d)),
    "q_dedup_first" -> ((s, d) => RelationalOps.dedupFirstWins(s, d)),
    "q_fuzzy_match" -> ((s, d) => RelationalOps.fuzzyBestMatch(s, d)),
    "q_window_agg" -> ((s, d) => RelationalOps.windowAgg(s, d)),
    "q_semi_join" -> ((s, d) => RelationalOps.semiJoin(s, d)),
    "q_anti_join" -> ((s, d) => RelationalOps.antiJoin(s, d)),
    // ---- training-data pipeline: dedup family ----
    "q_dedup_exact" -> ((s, d) => DedupOps.exact(s, d)),
    "q_minhash_sig" -> ((s, d) => DedupOps.minhashSignatures(s, d)),
    "q_minhash_lsh" -> ((s, d) => DedupOps.minhashLshPairsShared(s, d)),
    "q_simhash" -> ((s, d) => DedupOps.simhash(s, d)),
    "q_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccardDups(s, d, 0.8)),
    "q_embed_neardup" -> ((s, d) => DedupOps.embeddingNearDups(s, d)),
    "q_dedup_cc" -> ((s, d) => DedupOps.lshConnectedComponents(s, d)),
    "q_para_dedup" -> ((s, d) => DedupOps.paraDedup(s, d)),
    "q_span_dedup" -> ((s, d) => DedupOps.spanDedup(s, d)),
    // ---- similarity search ----
    "q_cosine_topk" -> ((s, d) => SimilarityOps.bruteForceTopK(s, d)),
    "q_ann_lsh" -> ((s, d) => SimilarityOps.lshBucketedNeighbors(s, d)),
    "q_ann_ivf" -> ((s, d) => SimilarityOps.ivfTopK(s, d)),
    "q_kmeans" -> ((s, d) => SimilarityOps.kmeansAssign(s, d)),
    "q_ann_recall" -> ((s, d) => SimilarityOps.annRecall(s, d)),
    "q_srp_recall" -> ((s, d) => SimilarityOps.srpRecall(s, d)),
    // ---- corpus hygiene (training-data pipeline) ----
    "q_pii_redact" -> ((s, d) => CorpusOps.piiRedact(s, d)),
    "q_url_norm" -> ((s, d) => CorpusOps.urlNormalize(s, d)),
    "q_blocklist" -> ((s, d) => CorpusOps.blocklistFilter(s, d)),
    "q_domain_cap" -> ((s, d) => CorpusOps.domainCap(s, d)),
    "q_decontaminate" -> ((s, d) => CorpusOps.decontaminate(s, d)),
    "q_repetition" -> ((s, d) => CorpusOps.repetitionStats(s, d)),
    "q_sample_strat" -> ((s, d) => CorpusOps.stratifiedSample(s, d)),
    "q_weighted_sample" -> ((s, d) => CorpusOps.weightedSample(s, d)),
    "q_mixture" -> ((s, d) => CorpusOps.mixtureSample(s, d)),
    "q_filter_pipeline" -> ((s, d) => CorpusOps.filterPipeline(s, d)),
    "q_pack" -> ((s, d) => CorpusOps.packSequences(s, d)),
    "q_corpus_e2e" -> ((s, d) => CorpusOps.corpusEndToEndAuto(s, d)),
    // ---- text analysis ----
    "q_langid" -> ((s, d) => TextAnalysisOps.langId(s, d)),
    "q_langid_acc" -> ((s, d) => TextAnalysisOps.langIdAccuracy(s, d)),
    "q_quality" -> ((s, d) => TextAnalysisOps.qualityScore(s, d)),
    "q_token_count" -> ((s, d) => TextAnalysisOps.tokenCount(s, d)),
    "q_fingerprint" -> ((s, d) => TextAnalysisOps.fingerprint(s, d)),
    "q_unigram_xent" -> ((s, d) => TextAnalysisOps.unigramXent(s, d)),
    "q_bm25" -> ((s, d) => TextAnalysisOps.bm25TopK(s, d)),
    "q_dsir" -> ((s, d) => TextAnalysisOps.dsirScore(s, d)),
  )

  /** Frozen golden oracle (inline VALUES SQL, tools/freeze_golden.py) —
    * used for queries whose semantics are row-local HTML extraction on
    * the deterministic fixture corpora, which have no independent SQL
    * restatement. The golden pins the ScalaTest-verified output so the
    * driver's DuckDB gate covers those queries too.
    */
  private def golden(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/golden/$name.sql")
    require(in != null, s"missing golden resource for $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  def oracleSql: Map[String, String] = Map(
    "q_mstr_reports" -> golden("q_mstr_reports"),
    "q_mstr_nodes" -> golden("q_mstr_nodes"),
    "q_mstr_edges" -> golden("q_mstr_edges"),
    "q_mstr_validate" -> golden("q_mstr_validate"),
    "q_mstr_join" -> golden("q_mstr_join"),
    "q_web_pipeline" -> golden("q_web_pipeline"),

    "q_extract_roundtrip" ->
      "SELECT doc_id, text FROM documents",

    "q_extract_expr" ->
      "SELECT doc_id, text FROM documents",

    "q_pdf_roundtrip" ->
      "SELECT doc_id, text FROM documents",

    "q_corpus_stats" ->
      """SELECT count(*) AS n_docs, count(*) AS n_parse_ok,
         CAST(sum(length(text)) AS BIGINT) AS total_text_chars
         FROM documents""",

    "q_extract_spans" ->
      """SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         'Doc ' || CAST(doc_id AS VARCHAR) AS h1,
         'Section ' || CAST(doc_id % 7 AS VARCHAR) AS h2,
         CAST(1 AS BIGINT) AS n_tables,
         CAST(3 AS BIGINT) AS n_rows,
         source AS cell_source,
         CAST(length(text) AS BIGINT) AS cell_len,
         source AS meta_source
         FROM documents""",

    // the oracle recomputes REAL per-modality codec output (PNG pixels,
    // WAV samples, AVI/DIB frames) from the three generation formulas —
    // all three decodes must exactly invert their encodes
    "q_media_decode" ->
      """WITH m AS (
           SELECT doc_id, CAST(doc_id % 3 AS INT) AS k,
                  CAST(16 + doc_id % 16 AS INT) AS iw,
                  CAST(16 + (doc_id * 3) % 16 AS INT) AS ih,
                  CAST(256 + doc_id % 256 AS BIGINT) AS ns,
                  CAST(8 + doc_id % 8 AS INT) AS vw,
                  CAST(8 + (doc_id * 5) % 8 AS INT) AS vh,
                  CAST(2 + doc_id % 4 AS INT) AS nf
           FROM documents)
         SELECT doc_id,
           CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CASE k WHEN 0 THEN iw WHEN 1 THEN 0 ELSE vw END AS width,
           CASE k WHEN 0 THEN ih WHEN 1 THEN 0 ELSE vh END AS height,
           CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN ns ELSE nf END AS BIGINT) AS n_units,
           CAST(CASE k
             WHEN 0 THEN list_sum(list_transform(generate_series(0, iw * ih - 1),
               p -> (doc_id * 31 + (p % iw) * 7 + (p // iw) * 13) % 256))
             WHEN 1 THEN list_sum(list_transform(generate_series(0, ns - 1),
               i -> abs((doc_id * 37 + i * 101) % 65536 - 32768)))
             ELSE list_sum(list_transform(generate_series(0, nf * vw * vh - 1),
               p -> (doc_id * 31 + (p // (vw * vh)) * 17
                     + ((p % (vw * vh)) % vw) * 7 + ((p % (vw * vh)) // vw) * 13) % 256))
           END AS BIGINT) AS sum_stat
         FROM m""",

    // one row per REAL decoded AVI frame: count and per-frame luma sums
    // from the generation formula
    "q_media_frames" ->
      """WITH v AS (
           SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS vw,
                  CAST(8 + (doc_id * 5) % 8 AS INT) AS vh,
                  CAST(2 + doc_id % 4 AS INT) AS nf
           FROM documents WHERE doc_id % 3 = 2),
         fi AS (SELECT unnest(generate_series(0, 4)) AS f)
         SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
                CAST(list_sum(list_transform(generate_series(0, vw * vh - 1),
                  p -> (doc_id * 31 + f * 17 + (p % vw) * 7 + (p // vw) * 13) % 256)) AS BIGINT) AS frame_luma
         FROM v JOIN fi ON fi.f < v.nf""",

    // full-clip AVI features over every document (not just the
    // round-robin video third): container walk + raw DIB pixel
    // integration must invert the hand-rolled AVI writer exactly
    "q_media_video" ->
      """WITH v AS (
           SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS vw,
                  CAST(8 + (doc_id * 5) % 8 AS INT) AS vh,
                  CAST(2 + doc_id % 4 AS INT) AS nf
           FROM documents)
         SELECT doc_id, vw AS width, vh AS height, CAST(nf AS BIGINT) AS n_frames,
                CAST(list_sum(list_transform(generate_series(0, nf * vw * vh - 1),
                  p -> (doc_id * 31 + (p // (vw * vh)) * 17
                        + ((p % (vw * vh)) % vw) * 7 + ((p % (vw * vh)) // vw) * 13) % 256)) AS BIGINT) AS luma_sum
         FROM v""",

    // the oracle recomputes REAL decoded pixel stats from the image
    // generation formula — PNG decode must exactly invert the encode
    "q_media_image" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(16 + doc_id % 16 AS INT) AS width,
                  CAST(16 + (doc_id * 3) % 16 AS INT) AS height
           FROM documents)
         SELECT doc_id, width, height,
                CAST(list_sum(flatten(list_transform(generate_series(0, height - 1),
                  j -> list_transform(generate_series(0, width - 1),
                    i -> (doc_id * 31 + i * 7 + j * 13) % 256)))) AS BIGINT) AS luma_sum
         FROM dims""",

    // the oracle recomputes REAL decoded sample stats from the WAV
    // generation formula — the JDK's RIFF/PCM parse must exactly invert
    // the hand-rolled encode
    "q_media_audio" ->
      """WITH a AS (SELECT doc_id, CAST(256 + doc_id % 256 AS BIGINT) AS n FROM documents)
         SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
                CAST(list_sum(list_transform(generate_series(0, n - 1),
                  i -> abs((doc_id * 37 + i * 101) % 65536 - 32768))) AS BIGINT) AS sum_abs,
                CAST(list_max(list_transform(generate_series(0, n - 1),
                  i -> abs((doc_id * 37 + i * 101) % 65536 - 32768))) AS INT) AS peak_abs
         FROM a""",

    "q_media_resize" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(16 + doc_id % 16 AS INT) AS width,
                  CAST(16 + (doc_id * 3) % 16 AS INT) AS height
           FROM documents),
         lum AS (
           SELECT doc_id,
             list_transform(generate_series(0, 63),
               p -> CAST((doc_id * 31 + ((p % 8) * width // 8) * 7 + ((p // 8) * height // 8) * 13) % 256 AS VARCHAR)) AS ls
           FROM dims)
         SELECT doc_id, md5(array_to_string(ls, ',')) AS resized_digest FROM lum""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2""",

    "q_join_agg" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1""",

    "q_bucketed_join" ->
      """SELECT o_orderdate,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1""",

    "q_partition_prune" ->
      """SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
         CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'purchase' GROUP BY 1""",

    "q_summary_counts" ->
      """SELECT
         (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_orders_ref,
         (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n_parts_ref,
         (SELECT count(*) FROM lineitem) AS n_lineitems,
         (SELECT count(DISTINCT o_custkey) FROM orders) AS n_customers_ref,
         (SELECT count(*) FROM customer) AS n_customers,
         (SELECT count(*) FROM part) AS n_parts""",

    "q_dup_id_check" ->
      "SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1 HAVING count(*) > 1",

    "q_filter_ci" ->
      "SELECT p_partkey, p_name FROM part WHERE contains(lower(p_name), 'al')",

    "q_regex_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k FROM events""",

    "q_href_split" ->
      """SELECT doc_id,
         string_split(source || '.html#' || upper(md5(text)), '#')[1] AS file,
         string_split(source || '.html#' || upper(md5(text)), '#')[2] AS anchor
         FROM documents""",

    "q_md5_form_id" ->
      """SELECT doc_id, upper(md5(source || '_' || CAST(doc_id AS VARCHAR))) AS form_id
         FROM documents""",

    "q_lookup_cascade" ->
      """SELECT e.event_id,
         coalesce(c.c_name, s.s_name, 'unresolved') AS resolved_name,
         CASE WHEN c.c_name IS NOT NULL THEN 'customer'
              WHEN s.s_name IS NOT NULL THEN 'supplier'
              ELSE 'none' END AS match_source
         FROM events e
         LEFT JOIN customer c ON e.user_id = c.c_custkey
         LEFT JOIN supplier s ON e.user_id = s.s_suppkey""",

    "q_validate" ->
      """WITH entities AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN md5(text)
                  WHEN doc_id % 7 = 1 THEN substr(upper(md5(text)), 1, 30)
                  ELSE upper(md5(text)) END AS entity_id,
             CASE CAST(doc_id % 5 AS INT)
                  WHEN 0 THEN 'simples' WHEN 1 THEN 'composto'
                  WHEN 2 THEN 'embedded' WHEN 3 THEN 'simples'
                  ELSE 'composto' END AS tipo,
             doc_id % 3 <> 0 AS has_fact,
             doc_id % 4 AS n_children
           FROM documents)
         SELECT doc_id, 'id_pattern' AS rule, 'error' AS severity FROM entities
         WHERE NOT regexp_matches(entity_id, '^[A-F0-9]{32}$')
         UNION ALL
         SELECT doc_id, 'tipo_enum', 'error' FROM entities
         WHERE tipo NOT IN ('simples', 'composto')
         UNION ALL
         SELECT doc_id, 'simple_without_fact', 'warning' FROM entities
         WHERE tipo = 'simples' AND NOT has_fact
         UNION ALL
         SELECT doc_id, 'composite_without_children', 'warning' FROM entities
         WHERE tipo = 'composto' AND n_children = 0""",

    "q_dedup_first" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders) WHERE rn = 1""",

    "q_semi_join" ->
      """SELECT DISTINCT user_id FROM events
         WHERE user_id IN (SELECT c_custkey FROM customer)""",

    "q_anti_join" ->
      """SELECT DISTINCT user_id FROM events e
         WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = e.user_id)""",

    "q_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q_fuzzy_match" ->
      """WITH probes AS (SELECT DISTINCT string_split(lower(p_name), ' ')[1] AS probe FROM part),
         cands AS (SELECT DISTINCT lower(p_name) AS cand FROM part),
         scored AS (
           SELECT probe, cand,
                  CASE WHEN contains(cand, probe)
                       THEN CAST(length(probe) AS DOUBLE) / length(cand) +
                            CASE WHEN starts_with(cand, probe) THEN 0.5 ELSE 0.0 END
                       ELSE 0.0 END AS score
           FROM probes CROSS JOIN cands)
         SELECT probe, cand, round(score, 4) AS score FROM (
           SELECT probe, cand, score,
                  row_number() OVER (PARTITION BY probe
                                     ORDER BY score DESC, cand) AS rn
           FROM scored WHERE score >= 0.2) WHERE rn = 1""",

    "q_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_doc_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",

    "q_minhash_sig" -> minhashSigOracle,
    "q_minhash_lsh" -> minhashLshOracle,

    "q_simhash" -> simhashOracle,

    "q_ngram_jaccard" -> ngramJaccardOracle,

    "q_cosine_topk" -> cosineTopkOracle,
    "q_ann_lsh" -> annLshOracle,
    "q_ann_ivf" -> ivfOracle,
    "q_kmeans" -> kmeansOracle,
    "q_ann_recall" -> annRecallOracle,
    "q_srp_recall" -> srpRecallOracle,
    "q_embed_neardup" -> embedNearDupOracle,
    "q_dedup_cc" -> dedupCcOracle,
    "q_para_dedup" -> paraDedupOracle,
    "q_span_dedup" -> spanDedupOracle,

    "q_url_norm" -> urlNormOracle,

    "q_blocklist" ->
      """WITH p AS (
           SELECT doc_id,
                  ' ' || replace(lower(text), ' ', '  ') || ' ' AS pd,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         h AS (
           SELECT doc_id, n_tokens,
             CAST((length(pd) - length(replace(pd, ' slow ', ''))) / 6 AS BIGINT)
             + CAST((length(pd) - length(replace(pd, ' junk ', ''))) / 6 AS BIGINT)
             + CAST((length(pd) - length(replace(pd, ' spam ', ''))) / 6 AS BIGINT)
             AS n_hits
           FROM p)
         SELECT doc_id, n_hits, n_tokens,
                n_hits > 0 AS c4_blocked,
                CAST(n_hits AS DOUBLE) / n_tokens > 0.05 AS ratio_blocked
         FROM h""",

    "q_bm25" ->
      """WITH qt(query_id, term) AS (VALUES
           (0,'table'),(0,'scan'),(1,'hash'),(1,'join'),(1,'fast'),
           (2,'window'),(2,'agg'),(3,'vector'),(3,'merge'),
           (4,'customer'),(4,'order'),(4,'query')),
         d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         lens AS (SELECT doc_id, len(t) AS dl FROM d),
         stats AS (SELECT count(*) AS n_docs,
                          CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM lens),
         tok AS (SELECT doc_id, unnest(t) AS w FROM d),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
                WHERE w IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
         dft AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         ts AS (SELECT qt.query_id, tf.doc_id,
                  CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                    * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                    9) AS DECIMAL(18,9)) AS term_score
                FROM tf JOIN dft USING (w) JOIN lens USING (doc_id), stats
                     JOIN qt ON qt.term = tf.w),
         sc AS (SELECT query_id, doc_id,
                       round(CAST(sum(term_score) AS DOUBLE), 6) AS score
                FROM ts GROUP BY 1, 2)
         SELECT query_id, doc_id, CAST(rn AS INT) AS rank, score FROM (
           SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rn
           FROM sc) WHERE rn <= 10""",

    "q_unigram_xent" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         counts AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
         tot AS (SELECT sum(cw) AS tt FROM counts),
         perdoc AS (SELECT doc_id, w, count(*) AS cwd FROM tok GROUP BY 1, 2)
         SELECT doc_id,
                CAST(sum(cwd) AS BIGINT) AS n_tokens,
                round(CAST(-sum(CAST(cwd AS DECIMAL(10,0))
                      * CAST(round(ln(cw / tt), 9) AS DECIMAL(18,9))) AS DOUBLE)
                  / sum(cwd), 6) AS xent
         FROM perdoc JOIN counts USING (w), tot
         GROUP BY doc_id""",

    "q_pii_redact" ->
      """WITH injected AS (
           SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or admin' || CAST(doc_id AS VARCHAR) || '@mail.test'
                  WHEN doc_id % 3 = 1 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  ELSE '' END ||
             CASE WHEN doc_id % 2 = 0 THEN ' phone ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS p
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(p, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(p, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(p, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'), '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_digest
         FROM injected""",

    "q_domain_cap" ->
      """SELECT doc_id, source, CAST(rn AS INT) AS rn FROM (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents) WHERE rn <= 2""",

    "q_decontaminate" -> decontaminateOracle,

    "q_repetition" -> repetitionOracle,

    "q_sample_strat" ->
      """SELECT doc_id, lang FROM documents
         WHERE substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) <
               CASE lang WHEN 'en' THEN '80000000'
                         WHEN 'pt' THEN 'e6666666'
                         WHEN 'es' THEN '33333333'
                         ELSE 'ffffffff' END""",

    "q_weighted_sample" ->
      """WITH ws AS (
           SELECT doc_id, CAST(1 + least(7, floor(n_chars / 200)) AS INT) AS w
           FROM documents),
         keys AS (
           SELECT doc_id, w,
                  max(md5('wsamp:' || CAST(doc_id AS VARCHAR) || ':'
                      || CAST(j AS VARCHAR))) AS skey
           FROM ws CROSS JOIN generate_series(1, 8) AS t(j)
           WHERE j <= w GROUP BY 1, 2)
         SELECT doc_id, w, skey FROM keys
         ORDER BY skey DESC, doc_id LIMIT 100""",

    "q_mixture" ->
      """WITH d AS (SELECT doc_id, lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
         tg(lang, share) AS (VALUES ('en', 0.5), ('es', 0.3), ('de', 0.2)),
         strata AS (SELECT lang, sum(n_tokens) AS stratum_tokens
                    FROM d GROUP BY 1),
         s2 AS (SELECT s.lang, stratum_tokens, share
                FROM strata s JOIN tg USING (lang)),
         bud AS (SELECT min(stratum_tokens / share) AS budget FROM s2),
         rates AS (SELECT lang, share * budget / stratum_tokens AS rate
                   FROM s2, bud),
         thr AS (SELECT lang,
                   CASE WHEN rate >= 1.0 - 1e-9 THEN 'g'
                        ELSE lpad(lower(hex(CAST(floor(rate * 4294967296.0)
                               AS BIGINT))), 8, '0') END AS thr
                 FROM rates)
         SELECT d.doc_id, d.lang, d.n_tokens,
                substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr
                  AS kept
         FROM d JOIN thr t USING (lang)""",

    "q_dsir" ->
      """WITH tok AS (
           SELECT doc_id, lang, substr(md5('dsir:' || w), 1, 2) AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                 FROM documents)),
         pd AS (SELECT doc_id, lang, b, count(*) AS c FROM tok GROUP BY 1, 2, 3),
         raw AS (SELECT b, sum(c) AS cr FROM pd GROUP BY 1),
         tgt AS (SELECT b, sum(c) AS ct FROM pd WHERE lang = 'en' GROUP BY 1),
         tot AS (SELECT (SELECT sum(cr) FROM raw) AS tr,
                        (SELECT coalesce(sum(ct), 0) FROM tgt) AS tt),
         wt AS (SELECT raw.b,
                       CAST(round(ln((coalesce(ct, 0) + 1.0) / (tt + 256))
                                - ln((cr + 1.0) / (tr + 256)), 9)
                            AS DECIMAL(18,9)) AS wgt
                FROM raw LEFT JOIN tgt USING (b), tot)
         SELECT pd.doc_id,
                CAST(sum(c) AS BIGINT) AS n_tokens,
                round(CAST(sum(CAST(c AS DECIMAL(10,0)) * wgt) AS DOUBLE)
                  / sum(c), 6) AS dsir_score
         FROM pd JOIN wt ON pd.b = wt.b
         GROUP BY 1""",

    "q_pack" ->
      """WITH t AS (
           SELECT doc_id, doc_id // 256 AS bucket,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, bucket, n_tokens,
                  coalesce(CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_tok
           FROM t)
         SELECT doc_id, bucket, n_tokens,
                start_tok // 4096 AS pack_id,
                start_tok % 4096 AS pack_offset
         FROM c""",

    "q_filter_pipeline" ->
      s"""WITH pred AS ($langidOracle),
         q AS (SELECT doc_id, quality_ok FROM ($qualityOracle)),
         rep AS (SELECT doc_id, repetition_ok FROM ($repetitionOracle)),
         cont AS (SELECT DISTINCT doc_id FROM ($decontaminateOracle))
         SELECT d.doc_id,
                (p.predicted_lang = 'en') AS lang_ok,
                q.quality_ok,
                coalesce(r.repetition_ok, TRUE) AS repetition_ok,
                (c.doc_id IS NULL) AS decontam_ok,
                ((p.predicted_lang = 'en') AND q.quality_ok
                  AND coalesce(r.repetition_ok, TRUE)
                  AND c.doc_id IS NULL) AS keep
         FROM documents d
         JOIN pred p ON d.doc_id = p.doc_id
         JOIN q ON d.doc_id = q.doc_id
         LEFT JOIN rep r ON d.doc_id = r.doc_id
         LEFT JOIN cont c ON d.doc_id = c.doc_id
         WHERE d.doc_id % 11 <> 0""",

    "q_corpus_e2e" -> corpusE2eOracle,

    "q_langid" -> langidOracle,
    "q_langid_acc" ->
      s"""WITH pred AS ($langidOracle)
         SELECT d.lang, pred.predicted_lang, count(*) AS n
         FROM pred JOIN documents d USING (doc_id)
         GROUP BY 1, 2""",

    "q_quality" -> qualityOracle,

    "q_token_count" ->
      """SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), ' +')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS re_tokens
         FROM documents""",

    "q_fingerprint" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
         FROM documents""",
  )

  // ---- long composed oracles ----

  /** Mirrors [[graft.ops.DedupOps.paraDedup]]: 20-token paragraph
    * chunking, injected header/footer boilerplate, first-wins by
    * ord = doc_id * 1000000 + idx, rebuild digest over kept paragraphs
    * in position order.
    */
  private val paraDedupOracle: String =
    """WITH d AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       p AS (
         SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN ['cookie policy applies to this site']
                ELSE CAST([] AS VARCHAR[]) END
           || list_transform(
                generate_series(0, CAST(floor((len(t) - 1) / 20.0) AS INT)),
                i -> array_to_string(t[i*20+1:i*20+20], ' '))
           || ['subscribe to the newsletter for updates'] AS paras
         FROM d),
       occ AS (
         SELECT doc_id, u.idx, paras[u.idx] AS para,
                doc_id * 1000000 + u.idx AS ord
         FROM p, unnest(generate_series(1, len(paras))) AS u(idx)),
       firsts AS (
         SELECT md5(para) AS h, min(ord) AS keep_ord
         FROM occ GROUP BY 1),
       kept AS (
         SELECT occ.doc_id, occ.idx, occ.para
         FROM occ JOIN firsts
           ON md5(occ.para) = firsts.h AND occ.ord = firsts.keep_ord)
       SELECT p.doc_id,
              CAST(len(p.paras) AS BIGINT) AS n_paras,
              CAST(count(kept.idx) AS BIGINT) AS n_kept,
              md5(coalesce(string_agg(kept.para, chr(10) ORDER BY kept.idx), ''))
                AS digest
       FROM p LEFT JOIN kept ON p.doc_id = kept.doc_id
       GROUP BY p.doc_id, p.paras"""

  /** Mirrors [[graft.ops.DedupOps.spanDedup]]: 8-gram occurrences,
    * first-wins by ord, every non-first occurrence marks its 8 token
    * positions, marked tokens cut, digest over the remaining tokens.
    */
  private val spanDedupOracle: String =
    """WITH d AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       occ AS (
         SELECT doc_id, u.p AS pos,
                md5(array_to_string(t[u.p:u.p+7], ' ')) AS h,
                doc_id * 1000000 + u.p AS ord
         FROM d, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(p)),
       keeps AS (
         SELECT min(ord) AS keep_ord FROM occ GROUP BY h),
       marks AS (
         SELECT DISTINCT occ.doc_id, v.i AS tpos
         FROM occ, unnest(generate_series(occ.pos, occ.pos + 7)) AS v(i)
         WHERE occ.ord NOT IN (SELECT keep_ord FROM keeps)),
       tok AS (
         SELECT doc_id, u.i AS tpos, t[u.i] AS w
         FROM d, unnest(generate_series(1, len(t))) AS u(i)),
       kept AS (
         SELECT tok.doc_id, tok.tpos, tok.w FROM tok
         WHERE NOT EXISTS (SELECT 1 FROM marks
           WHERE marks.doc_id = tok.doc_id AND marks.tpos = tok.tpos))
       SELECT d.doc_id,
              CAST(len(d.t) AS BIGINT) AS n_tokens,
              CAST(len(d.t) - count(kept.tpos) AS BIGINT) AS n_removed,
              md5(coalesce(string_agg(kept.w, ' ' ORDER BY kept.tpos), '')) AS digest
       FROM d LEFT JOIN kept ON d.doc_id = kept.doc_id
       GROUP BY d.doc_id, d.t"""

  /** Mirrors [[graft.ops.CorpusOps.urlNormalize]]: identical messy-url
    * injection, then the same regex/list normalization pipeline.
    */
  private val urlNormOracle: String =
    """WITH m AS (
         SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://'
           || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example'
                    ELSE 'cdn.Site' || CAST(doc_id % 5 AS VARCHAR) END)
           || (CASE WHEN doc_id % 4 = 0 THEN '.CO.UK' ELSE '.COM' END)
           || (CASE WHEN doc_id % 7 = 3 THEN ':8080'
                    WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
           || '/Articles/item' || CAST(doc_id AS VARCHAR)
           || (CASE WHEN doc_id % 3 = 1 THEN '/' ELSE '' END)
           || '?utm_source=feed'
           || (CASE WHEN doc_id % 2 = 0 THEN '&ref=Home&a=1'
                    ELSE '&b=' || CAST(doc_id % 9 AS VARCHAR) || '&A=2' END)
           || '&fbclid=x' || CAST(doc_id AS VARCHAR)
           || (CASE WHEN doc_id % 2 = 1
                    THEN '#Sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END)
           AS raw_url
         FROM documents),
       parts AS (
         SELECT doc_id, raw_url,
           lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
           regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
         FROM m),
       norm AS (
         SELECT doc_id, raw_url, scheme,
           lower(regexp_replace(auth, ':[0-9]+$', '')) AS host,
           regexp_extract(auth, ':([0-9]+)$', 1) AS port,
           CASE WHEN regexp_replace(regexp_extract(rest, '^([^?#]*)', 1), '/$', '') = ''
                THEN '/'
                ELSE regexp_replace(regexp_extract(rest, '^([^?#]*)', 1), '/$', '') END AS path_n,
           array_to_string(list_sort(list_filter(
             string_split(regexp_extract(rest, '\?([^#]*)', 1), '&'),
             p -> p <> '' AND NOT regexp_matches(p, '^(utm_|fbclid=|gclid=)'))), '&') AS q_n
         FROM parts),
       lab AS (
         SELECT doc_id, raw_url, scheme, host, port, path_n, q_n,
                string_split(host, '.') AS labels
         FROM norm)
       SELECT doc_id, raw_url,
         scheme || '://' || host
           || (CASE WHEN port = '' THEN ''
                    WHEN scheme = 'http' AND port = '80' THEN ''
                    WHEN scheme = 'https' AND port = '443' THEN ''
                    ELSE ':' || port END)
           || path_n
           || (CASE WHEN q_n = '' THEN '' ELSE '?' || q_n END) AS canon_url,
         CASE WHEN len(labels) >= 3
                   AND labels[-2] IN ('co', 'com', 'org', 'net', 'gov', 'ac')
              THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
              ELSE labels[-2] || '.' || labels[-1] END AS registered_domain
       FROM lab"""

  private val qualityOracle: String =
    """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_m,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_word_len,
         round(CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
             + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' a ', ''))) / 3
             + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5
             + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4
             + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' to ', ''))) / 4
             + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' in ', ''))) / 4
           AS DOUBLE) / len(string_split(text, ' ')), 4) AS stopword_ratio,
         round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio,
         (len(string_split(text, ' ')) >= 10
          AND round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) >= 2.5
          AND round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) <= 12.0) AS quality_ok
         FROM documents"""

  private val repetitionOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         b AS (
           SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct,
                  unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])) AS bg
           FROM w WHERE len(ws) >= 2),
         c AS (SELECT doc_id, n_words, n_distinct, bg, count(*) AS n FROM b GROUP BY 1, 2, 3, 4),
         agg AS (SELECT doc_id, n_words, n_distinct, max(n) AS top_bigram_n,
                        CAST(sum(n) AS BIGINT) AS n_bigrams
                 FROM c GROUP BY 1, 2, 3)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS dup_word_frac,
                round(CAST(top_bigram_n AS DOUBLE) / n_bigrams, 4) AS top_bigram_frac,
                (round(CAST(top_bigram_n AS DOUBLE) / n_bigrams, 4) <= 0.18) AS repetition_ok
         FROM agg"""

  private val decontaminateOracle: String =
    """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         g AS (
           SELECT doc_id, unnest(CASE WHEN len(ws) >= 5
             THEN list_transform(generate_series(1, len(ws) - 4),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
             ELSE [text] END) AS gram
           FROM w),
         bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 11 = 0)
         SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared
         FROM g JOIN bench USING (gram)
         WHERE g.doc_id % 11 <> 0
         GROUP BY 1"""

  private val shinglesCte =
    """sh AS (
         SELECT doc_id,
                CASE WHEN len(string_split(text, ' ')) >= 3
                     THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                            i -> string_split(text, ' ')[i] || ' ' ||
                                 string_split(text, ' ')[i+1] || ' ' ||
                                 string_split(text, ' ')[i+2])
                     ELSE [text] END AS shingles
         FROM documents)"""

  private def sigCte: String = {
    val cols = (0 until DedupOps.NumHashes).map { k =>
      s"list_min(list_transform(shingles, s -> substr(md5('$k:' || s), 1, 16))) AS mh$k"
    }.mkString(",\n                ")
    s"""sig AS (
         SELECT doc_id,
                $cols
         FROM sh)"""
  }

  private val minhashSigOracle: String =
    s"""WITH $shinglesCte,
       $sigCte
       SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM sig"""

  private val minhashLshOracle: String =
    s"""WITH $shinglesCte,
       $sigCte,
       bands AS (
         SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
         UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
         UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
         UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig)
       SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       FROM bands l JOIN bands r USING (band, band_key)
       WHERE l.doc_id < r.doc_id"""

  private val simhashOracle: String = {
    val votes = (0 until 16).map { i =>
      s"sum(CASE WHEN substr(h, ${i + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$i"
    }.mkString(", ")
    val bits = (0 until 16).map(i => s"CASE WHEN v$i >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""WITH toks AS (
         SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
       votes AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id)
       SELECT doc_id, $bits AS simhash FROM votes"""
  }

  private val ngramJaccardOracle: String =
    s"""WITH $shinglesCte,
       $sigCte,
       bands AS (
         SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
         UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
         UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
         UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig),
       pairs AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band, band_key)
         WHERE l.doc_id < r.doc_id),
       sets AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh)
       SELECT a, b,
              round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                    len(list_distinct(list_concat(sa.s, sb.s))), 4) AS jaccard
       FROM pairs
       JOIN sets sa ON pairs.a = sa.doc_id
       JOIN sets sb ON pairs.b = sb.doc_id
       WHERE round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                   len(list_distinct(list_concat(sa.s, sb.s))), 4) >= 0.8"""

  private val dotSql: String =
    "list_sum(list_transform(generate_series(1, 64), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"

  private val cosineTopkOracle: String = {
    val dotQC = dotSql.format("qvec", "cvec")
    val dotQQ = dotSql.format("qvec", "qvec")
    val dotCC = dotSql.format("cvec", "cvec")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 10),
       c AS (SELECT vec_id AS neighbor_id, embedding AS cvec FROM embeddings),
       scored AS (
         SELECT query_id, neighbor_id,
                round($dotQC / (sqrt($dotQQ) * sqrt($dotCC)), 6) AS cos
         FROM c CROSS JOIN q WHERE query_id <> neighbor_id)
       SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rn FROM (
         SELECT query_id, neighbor_id, cos,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
         FROM scored) WHERE rn <= 5"""
  }

  /** planesPerBand(n, 8) in portable SQL — must mirror
    * [[graft.ops.SimilarityOps.planesPerBand]] exactly (same epsilon).
    */
  private val ppbSql: String =
    "greatest(4, CAST(ceil(log2(count(*) / 8.0) - 1e-9) AS INT))"

  private val annLshOracle: String = {
    val dotAB = dotSql.format("va", "vb")
    val dotAA = dotSql.format("va", "va")
    val dotBB = dotSql.format("vb", "vb")
    s"""WITH np AS (SELECT greatest(8, $ppbSql) AS n FROM embeddings),
       planes AS (
         SELECT p,
                list_transform(generate_series(0, 63),
                  j -> CASE WHEN substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(j // 16 AS VARCHAR)),
                                        (j % 16) + 1, 1) >= '8'
                            THEN 1.0 ELSE -1.0 END) AS w
         FROM np, unnest(generate_series(0, CAST(np.n - 1 AS BIGINT))) AS t1(p)),
       proj AS (
         SELECT e.vec_id, pl.p,
                list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) AS dp
         FROM embeddings e CROSS JOIN planes pl),
       buckets AS (
         SELECT vec_id,
                string_agg(CASE WHEN dp >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         FROM proj GROUP BY vec_id),
       be AS (
         SELECT b.vec_id, b.bucket, e.embedding
         FROM buckets b JOIN embeddings e ON b.vec_id = e.vec_id)
       SELECT l.vec_id AS a, r.vec_id AS b,
              round($dotAB / (sqrt($dotAA) * sqrt($dotBB)), 6) AS cos
       FROM (SELECT vec_id, bucket, embedding AS va FROM be) l
       JOIN (SELECT vec_id, bucket, embedding AS vb FROM be) r USING (bucket)
       WHERE l.vec_id < r.vec_id
         AND round($dotAB / (sqrt($dotAA) * sqrt($dotBB)), 6) >= 0.2"""
  }

  private val dedupCcOracle: String =
    s"""WITH RECURSIVE $shinglesCte,
       $sigCte,
       bands AS (
         SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
         UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
         UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
         UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig),
       prs AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band, band_key)
         WHERE l.doc_id < r.doc_id),
       e AS (SELECT a AS s, b AS t FROM prs UNION SELECT b, a FROM prs),
       walk(s, t) AS (
         SELECT s, t FROM e
         UNION
         SELECT w.s, e2.t FROM walk w JOIN e e2 ON w.t = e2.s)
       SELECT s AS doc_id, least(s, min(t)) AS component
       FROM walk GROUP BY s"""

  /** The whole [[graft.ops.CorpusOps.corpusEndToEnd]] chain restated in
    * SQL against `documents` — valid because extraction is byte-identical
    * per url (q_extract_roundtrip), so the Spark side's committed
    * extracted table and the oracle's source text agree byte-for-byte.
    * Stage fragments: exact dedup (q_dedup_exact), LSH connected
    * components (q_dedup_cc's recursive walk), the four filter signals
    * (q_filter_pipeline), and the pack cumulative-sum (q_pack) over the
    * surviving kept set.
    */
  // lazy: interpolates langidOracle, declared later in the file
  private lazy val corpusE2eOracle: String =
    s"""WITH RECURSIVE $shinglesCte,
       $sigCte,
       bands AS (
         SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
         UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
         UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
         UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig),
       prs AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band, band_key)
         WHERE l.doc_id < r.doc_id),
       e AS (SELECT a AS s, b AS t FROM prs UNION SELECT b, a FROM prs),
       walk(s, t) AS (
         SELECT s, t FROM e
         UNION
         SELECT w.s, e2.t FROM walk w JOIN e e2 ON w.t = e2.s),
       cc AS (SELECT s AS doc_id, least(s, min(t)) AS component
              FROM walk GROUP BY s),
       exact_kept AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       surv AS (
         SELECT k.doc_id FROM exact_kept k LEFT JOIN cc ON k.doc_id = cc.doc_id
         WHERE cc.component IS NULL OR cc.component = k.doc_id),
       pred AS ($langidOracle),
       qual AS (SELECT doc_id, quality_ok FROM ($qualityOracle)),
       rep AS (SELECT doc_id, repetition_ok FROM ($repetitionOracle)),
       cont AS (SELECT DISTINCT doc_id FROM ($decontaminateOracle)),
       kept AS (
         SELECT d.doc_id
         FROM documents d
         JOIN surv USING (doc_id)
         JOIN pred p ON d.doc_id = p.doc_id
         JOIN qual q ON d.doc_id = q.doc_id
         LEFT JOIN rep r ON d.doc_id = r.doc_id
         LEFT JOIN cont c ON d.doc_id = c.doc_id
         WHERE d.doc_id % 11 <> 0
           AND p.predicted_lang = 'en' AND q.quality_ok
           AND coalesce(r.repetition_ok, TRUE) AND c.doc_id IS NULL),
       pk AS (
         SELECT d.doc_id, d.doc_id // 256 AS bucket,
                CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         FROM documents d JOIN kept USING (doc_id)),
       cum AS (
         SELECT doc_id, bucket, n_tokens,
                coalesce(CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_tok
         FROM pk)
       SELECT doc_id, bucket, n_tokens,
              start_tok // 4096 AS pack_id,
              start_tok % 4096 AS pack_offset
       FROM cum"""

  /** Two unrolled Lloyd rounds + the final assignment, replaying
    * [[graft.ops.SimilarityOps.kmeansAssign]] exactly: 6-dp-rounded
    * cosine with smallest-cent_id tiebreak for assignment, 7-dp-rounded
    * member values accumulated in DECIMAL for the update mean (rounded
    * to 6 dp) — every round is deterministic on both engines.
    */
  private val kmeansOracle: String = {
    def cosOf(ev: String, en: String, cv: String): String =
      s"round(${dotSql.format(ev, cv)} / ($en * sqrt(${dotSql.format(cv, cv)})), 6)"
    def assignCte(cents: String, out: String): String =
      s"""$out AS (
         SELECT vec_id, embedding, cent_id, ccos FROM (
           SELECT e.vec_id, e.embedding, c.cent_id,
                  ${cosOf("e.embedding", "e.nrm", "c.cvec")} AS ccos,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY
                    ${cosOf("e.embedding", "e.nrm", "c.cvec")} DESC, c.cent_id) AS rn
           FROM en e CROSS JOIN $cents c) WHERE rn = 1)"""
    def updateCte(assigned: String, out: String): String =
      s"""$out AS (
         SELECT cent_id, list(m ORDER BY p) AS cvec FROM (
           SELECT cent_id, p,
                  round(CAST(sum(CAST(round(CAST(embedding[p] AS DOUBLE), 7)
                    AS DECIMAL(18,10))) AS DOUBLE) / count(*), 6) AS m
           FROM $assigned, generate_series(1, 64) AS g(p)
           GROUP BY 1, 2) GROUP BY 1)"""
    s"""WITH st AS (SELECT greatest(1, count(*) // 16) AS stride FROM embeddings),
       en AS (SELECT vec_id, embedding,
                     sqrt(${dotSql.format("embedding", "embedding")}) AS nrm
              FROM embeddings),
       c0 AS (SELECT vec_id AS cent_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
              FROM embeddings, st WHERE vec_id % st.stride = 0),
       ${assignCte("c0", "a1")},
       ${updateCte("a1", "c1")},
       ${assignCte("c1", "a2")},
       ${updateCte("a2", "c2")},
       ${assignCte("c2", "af")}
       SELECT vec_id, cent_id, ccos FROM af"""
  }

  private val ivfOracle: String = {
    val cosEC = s"round(${dotSql.format("e.embedding", "c.cvec")} / (sqrt(${dotSql.format("e.embedding", "e.embedding")}) * sqrt(${dotSql.format("c.cvec", "c.cvec")})), 6)"
    val cosQA = s"round(${dotSql.format("p.qvec", "a.embedding")} / (sqrt(${dotSql.format("p.qvec", "p.qvec")}) * sqrt(${dotSql.format("a.embedding", "a.embedding")})), 6)"
    s"""WITH st AS (SELECT greatest(1, count(*) // 16) AS stride FROM embeddings),
       cents AS (
         SELECT vec_id AS cent_id, embedding AS cvec
         FROM embeddings, st WHERE vec_id % st.stride = 0),
       sc AS (
         SELECT e.vec_id, e.embedding, c.cent_id, $cosEC AS ccos
         FROM embeddings e CROSS JOIN cents c),
       ranked AS (
         SELECT vec_id, embedding, cent_id, ccos,
                row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
         FROM sc),
       assigned AS (SELECT vec_id, embedding, cent_id FROM ranked WHERE rn = 1),
       probes AS (
         SELECT vec_id AS query_id, embedding AS qvec, cent_id
         FROM ranked WHERE vec_id < 10 AND rn <= 2),
       scored AS (
         SELECT p.query_id, a.vec_id AS neighbor_id, $cosQA AS cos
         FROM assigned a JOIN probes p USING (cent_id)
         WHERE p.query_id <> a.vec_id)
       SELECT query_id, neighbor_id, cos, CAST(rn AS INT) AS rn FROM (
         SELECT query_id, neighbor_id, cos,
                row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
         FROM scored) WHERE rn <= 5"""
  }

  /** Recall@k of IVF vs exact top-k, recomputed end to end (both CTEs
    * are the already-verified oracles) — not a pinned constant, so a
    * regression in nProbe/nCentroids/stride moves a NUMBER the gate
    * checks. Recall < 1.0 happens exactly when a query's true neighbor
    * is assigned to a cell outside the query's 2 nearest of the 16
    * stride-sampled cells; on the isotropic synthetic embeddings that
    * is the common case (mean ≈ 0.3 — no cluster structure to exploit),
    * which is precisely the honest baseline the gauge should show.
    */
  private val annRecallOracle: String =
    s"""WITH exact_topk AS ($cosineTopkOracle),
       approx_topk AS ($ivfOracle)
       SELECT e.query_id,
              round(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5, 4) AS recall_at_k
       FROM exact_topk e LEFT JOIN approx_topk a
         ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       GROUP BY e.query_id"""

  /** SRP candidate-generation recall vs thresholded exact top-k (the
    * gauge [[graft.ops.SimilarityOps.srpRecall]]): the banded-bucket
    * CTEs are the verified q_embed_neardup ones minus the cosine
    * verify; ground truth is the verified cosine-top-k CTE filtered to
    * cos >= 0.2. A query with an empty thresholded top-k contributes
    * no row on either side.
    */
  private val srpRecallOracle: String =
    s"""WITH nn AS (SELECT $ppbSql AS ppb FROM embeddings),
       planes AS (
         SELECT p,
                list_transform(generate_series(0, 63),
                  j -> CASE WHEN substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(j // 16 AS VARCHAR)),
                                        (j % 16) + 1, 1) >= '8'
                            THEN 1.0 ELSE -1.0 END) AS w
         FROM nn, unnest(generate_series(0, CAST(4 * nn.ppb - 1 AS BIGINT))) AS t1(p)),
       proj AS (
         SELECT e.vec_id, pl.p,
                list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) AS dp
         FROM embeddings e CROSS JOIN planes pl),
       buckets AS (
         SELECT vec_id, p // nn.ppb AS band,
                string_agg(CASE WHEN dp >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         FROM proj, nn GROUP BY vec_id, p // nn.ppb),
       pairs AS (
         SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         FROM buckets l JOIN buckets r USING (band, bucket)
         WHERE l.vec_id < r.vec_id),
       cand AS (
         SELECT a AS query_id, b AS neighbor_id FROM pairs WHERE a < 10
         UNION
         SELECT b, a FROM pairs WHERE b < 10),
       exact_topk AS ($cosineTopkOracle),
       ex AS (SELECT query_id, neighbor_id FROM exact_topk WHERE cos >= 0.2)
       SELECT ex.query_id,
              round(CAST(sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS recall_at_k
       FROM ex LEFT JOIN cand c
         ON ex.query_id = c.query_id AND ex.neighbor_id = c.neighbor_id
       GROUP BY ex.query_id"""

  private val embedNearDupOracle: String = {
    val cosAB = s"round(${dotSql.format("ea.embedding", "eb.embedding")} / (sqrt(${dotSql.format("ea.embedding", "ea.embedding")}) * sqrt(${dotSql.format("eb.embedding", "eb.embedding")})), 6)"
    s"""WITH nn AS (SELECT $ppbSql AS ppb FROM embeddings),
       planes AS (
         SELECT p,
                list_transform(generate_series(0, 63),
                  j -> CASE WHEN substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(j // 16 AS VARCHAR)),
                                        (j % 16) + 1, 1) >= '8'
                            THEN 1.0 ELSE -1.0 END) AS w
         FROM nn, unnest(generate_series(0, CAST(4 * nn.ppb - 1 AS BIGINT))) AS t1(p)),
       proj AS (
         SELECT e.vec_id, pl.p,
                list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(e.embedding[i] AS DOUBLE) * pl.w[i])) AS dp
         FROM embeddings e CROSS JOIN planes pl),
       buckets AS (
         SELECT vec_id, p // nn.ppb AS band,
                string_agg(CASE WHEN dp >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         FROM proj, nn GROUP BY vec_id, p // nn.ppb),
       pairs AS (
         SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         FROM buckets l JOIN buckets r USING (band, bucket)
         WHERE l.vec_id < r.vec_id),
       close_pairs AS (
         SELECT a, b
         FROM pairs JOIN embeddings ea ON pairs.a = ea.vec_id
                    JOIN embeddings eb ON pairs.b = eb.vec_id
         WHERE $cosAB >= 0.4)
       SELECT b AS doc_id, min(a) AS dup_of FROM close_pairs GROUP BY b"""
  }

  private val langidOracle: String = {
    def sc(ws: Seq[String]): String = ws.map { w =>
      s"(length(p) - length(replace(p, '$w', ''))) / ${w.length}"
    }.mkString("CAST(", " + ", " AS BIGINT)")
    val en = sc(Seq(" the ", " and ", " of ", " is ", " a "))
    val pt = sc(Seq(" de ", " que ", " do ", " da ", " em "))
    val es = sc(Seq(" el ", " la ", " los ", " en ", " y "))
    s"""SELECT doc_id, en_score, pt_score, es_score,
              CASE WHEN en_score >= pt_score AND en_score >= es_score THEN 'en'
                   WHEN pt_score >= es_score THEN 'pt'
                   ELSE 'es' END AS predicted_lang
       FROM (
         SELECT doc_id, $en AS en_score, $pt AS pt_score, $es AS es_score
         FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents))"""
  }
}
