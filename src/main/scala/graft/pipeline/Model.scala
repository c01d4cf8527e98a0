package graft.pipeline

import java.sql.Timestamp

/** Row of the pages input table — schema exactly per BASELINE.json
  * input_hint: (url, warc_ts, html: binary, text, lang).
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Output row of the main-content extraction pass, with per-row
  * extraction metrics (north rule: per-partition lineage + metrics).
  */
final case class ExtractedDoc(
    url: String,
    warc_ts: Timestamp,
    text: String,
    lang: String,
    blocks: Int,
    content_blocks: Int,
    html_bytes: Long,
    text_chars: Long,
    parse_ok: Boolean)

/** Per-partition lineage/metrics row (north rule: docs/sec, parse
  * failures, bytes stripped per partition, resumability evidence).
  */
final case class PartitionLineage(
    partition_id: Int,
    docs: Long,
    parse_failures: Long,
    html_bytes: Long,
    text_chars: Long,
    bytes_stripped: Long,
    nanos: Long)
