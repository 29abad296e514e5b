package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.TextAnalysis

/** Streaming ingest-time curation gate: the C4-style blocklist filter
  * applied to arriving documents BEFORE they reach the index/dedup
  * stages — the shape a 100 TB pipeline wants, because a doc dropped at
  * ingest never costs a shuffle downstream.
  *
  * The gate is [[TextAnalysis.blocklistOn]] verbatim — stateless per-row
  * projections (tokenize, count, integer-bp threshold), so it runs in
  * append mode with NO state store, no watermark, and micro-batch
  * boundaries cannot change results (StreamingCurationSpec pins
  * streamed ≡ batch on the same rows). Rejected rows keep their scores
  * (keep = 0) when `passOnly = false`, for a quarantine/audit sink.
  */
object StreamingCuration {

  def gate(stream: DataFrame, thresholdBp: Long = 500L,
      passOnly: Boolean = true): DataFrame = {
    val scored = TextAnalysis.blocklistOn(stream, thresholdBp)
    if (passOnly) scored.where(scored("keep") === 1L) else scored
  }
}
