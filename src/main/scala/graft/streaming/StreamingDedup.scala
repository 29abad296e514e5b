package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the training-pipeline "dedup the
  * firehose" operator: content-hash `dropDuplicatesWithinWatermark`, so
  * the dedup state is bounded by the watermark horizon instead of
  * growing forever (the batch analog is `Dedup.exact`; the reference's
  * analog is duplicate-key rejection on concurrent `add`,
  * /root/reference/include/usearch/index_dense.hpp:2003-2050).
  *
  * Semantics: within any window of `watermark` event time, only the
  * first arrival of each distinct content survives; re-arrivals later
  * than the watermark horizon are treated as new documents (state was
  * evicted) — the standard at-scale trade (unbounded exact dedup needs
  * unbounded state; for full-history dedup run the batch `Dedup.exact`
  * over the compacted table).
  */
object StreamingDedup {

  /** @param stream streaming DataFrame with `tsCol` (timestamp) + `textCol`
    * @return deduplicated stream (original columns + text_md5)
    */
  def dedupe(
      stream: DataFrame,
      textCol: String = "content",
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    stream
      .withColumn("text_md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_md5")
}
