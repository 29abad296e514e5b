package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyze.Tokenizer

/** Watermarked windowed aggregation over event/document streams — the
  * Structured-Streaming face of the analytics the batch entries compute
  * over the `events` table (SURVEY.md §2.7: streaming is deliberately
  * absent in the reference — a single-process engine ingests via `add` —
  * so this is Spark-built-in territory, like `StreamingIngest`'s LSM
  * generations).
  *
  * Both operators are plain DataFrame transforms, so they run UNCHANGED
  * on batch input: the driver entry `q_events_window` executes
  * [[eventStats]] against the batch events table with a DuckDB oracle,
  * and StreamingWindowSpec proves the micro-batched execution emits the
  * same finalized windows (minus post-watermark late data, which is the
  * point of the watermark).
  */
object StreamingWindow {

  /** Tumbling-window per-event-type stats. Watermark bounds state: a
    * window's accumulator is finalized and evicted once event time
    * passes `window end + watermark`; later arrivals for it are dropped.
    * Money-rule float discipline: values sum in DECIMAL, one double cast
    * at the end (cross-engine exact; same as `q_events_daily`).
    *
    * @param stream events-shaped input (batch or streaming) with
    *               `tsCol: timestamp`, `event_type`, `value`
    */
  def eventStats(
      stream: DataFrame,
      windowDur: String = "10 minutes",
      watermark: String = "20 minutes",
      tsCol: String = "ts"): DataFrame = {
    val in = if (stream.isStreaming) stream.withWatermark(tsCol, watermark) else stream
    in.groupBy(window(col(tsCol), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("string").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** DuckDB twin of [[eventStats]] over the batch events table
    * (`time_bucket` and Spark's tumbling `window` are both epoch-aligned,
    * and 10 minutes divides the hour, so bucket starts coincide).
    */
  val eventStatsSql: String =
    """SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS VARCHAR) AS win_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  /** Trending terms: tokenize a document stream, count term occurrences
    * per tumbling window — the streaming twin of the tf/df build stages.
    * State per window is bounded by the vocabulary seen in it; the
    * watermark evicts finalized windows.
    */
  def trendingTerms(
      stream: DataFrame,
      windowDur: String = "10 minutes",
      watermark: String = "20 minutes",
      textCol: String = "text",
      tsCol: String = "ts"): DataFrame = {
    val in = if (stream.isStreaming) stream.withWatermark(tsCol, watermark) else stream
    in.select(col(tsCol), explode(Tokenizer.tokensCol(col(textCol))).as("term"))
      .groupBy(window(col(tsCol), windowDur), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("win_start"), col("term"), col("n"))
  }
}
