package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed corpus-level extraction stats (SURVEY §2.8's
  * `Aggregator[Metric, Buf, Report]`): one pass over
  * `Dataset[ExtractedDoc]`, map-side partial merge, single reduced row.
  */
final case class CorpusStats(
    n_docs: Long, n_parse_ok: Long, total_text_chars: Long)

object ExtractStatsAggregator
    extends Aggregator[ExtractedDoc, CorpusStats, CorpusStats] {

  override def zero: CorpusStats = CorpusStats(0L, 0L, 0L)

  override def reduce(b: CorpusStats, d: ExtractedDoc): CorpusStats =
    CorpusStats(
      b.n_docs + 1,
      b.n_parse_ok + (if (d.parse_ok) 1L else 0L),
      b.total_text_chars + d.text_chars)

  override def merge(a: CorpusStats, b: CorpusStats): CorpusStats =
    CorpusStats(a.n_docs + b.n_docs, a.n_parse_ok + b.n_parse_ok,
      a.total_text_chars + b.total_text_chars)

  override def finish(r: CorpusStats): CorpusStats = r
  override def bufferEncoder: Encoder[CorpusStats] = Encoders.product[CorpusStats]
  override def outputEncoder: Encoder[CorpusStats] = Encoders.product[CorpusStats]
}
