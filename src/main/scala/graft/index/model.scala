package graft.index

/** Storage model of the inverted index — the Spark-native replacement for
  * the reference's serialized graph+vectors format
  * (/root/reference/include/usearch/index_dense.hpp:29-79,
  * /root/reference/docs/format.md:32-87): Parquet segment files + small
  * metadata tables, Iceberg-style (hand-rolled manifests; no Iceberg jar
  * offline — SURVEY.md §7.0).
  */

/** One encoded 128-posting block (delta+varbyte) with its block-max
  * tf-normalization summary for WAND pruning.
  */
final case class EncBlock(
    first: Long,
    last: Long,
    count: Int,
    maxTfNorm: Double,
    bytes: Array[Byte])

/** Postings of one term restricted to one docId bucket. The bucket split
  * IS the skew treatment: a hot term ("def", "import") spreads across
  * every bucket, so no single task owns its whole posting list — the
  * storage is salted, the math untouched (SURVEY.md §7.5.2).
  */
final case class PostingRow(
    term: String,
    bucket: Int,
    df: Long, // df of the term within this bucket
    maxTfNorm: Double, // max over this row's blocks (bucket-local UB)
    blocks: Array[EncBlock])

/** Per-bucket document norms (the Lucene-norms analog): docIds ascending,
  * parallel token counts. Co-partitioned with PostingRow by bucket.
  */
final case class DocLenRow(bucket: Int, docIds: Array[Long], lens: Array[Long])

/** One encoded positional block (graft.codec.PositionCodec layout). */
final case class PosBlock(first: Long, last: Long, count: Int, bytes: Array[Byte])

/** Positional postings of one term within one docId bucket — the opt-in
  * positions SIDECAR table (`Layout.positions`), kept apart from
  * [[PostingRow]] so frequency-only queries never read position bytes
  * (Lucene's .doc/.pos separation). Self-contained (docIds re-encoded
  * with the positions), so a phrase query costs ONE pruned read of this
  * table, not a postings+positions join.
  */
final case class PosRow(term: String, bucket: Int, df: Long, blocks: Array[PosBlock])

/** Dictionary: global df, global max tf-norm (WAND term UB), and the
  * ascending list of buckets holding the term — one pruned dictionary
  * read then answers BOTH "which terms exist / their UBs" and "which
  * bucket partitions to touch", so a query costs one metadata job, not
  * two (the old plan ran a separate postings scan just to collect the
  * distinct buckets). The list is always explicit — generation indexes
  * hold docId subranges whose bucket ids are not 0-based, so an
  * "all buckets" sentinel cannot be expanded without knowing the
  * range — and is bounded by the bucket count (≈ target parallelism).
  */
final case class DictRow(term: String, df: Long, maxTfNorm: Double, buckets: Array[Int])

/** Index-wide scalars (the `stats()` analog,
  * /root/reference/include/usearch/index.hpp:3133-3210).
  */
final case class IndexStats(
    nDocs: Long,
    totalTokens: Long,
    nTerms: Long,
    totalPostings: Long,
    bucketSize: Long,
    nBuckets: Int) {
  def avgdl: Double = totalTokens.toDouble / nDocs.toDouble
}

/** Iceberg-style manifest row: lineage + metrics per build stage/partition
  * (north rule: checkpoint-resumable with per-partition lineage + metrics).
  */
final case class ManifestRow(
    snapshotId: Long,
    stage: String,
    partitionId: Int,
    path: String,
    rows: Long,
    elapsedMs: Long,
    status: String)

/** A single ranked search hit; results are totally ordered
  * (score desc, docId asc) so parallelism cannot change ranks.
  */
final case class Hit(docId: Long, score: Double)

/** Corpus-wide scoring statistics. When searching one shard of a
  * multi-generation index (the `Indexes` analog,
  * /root/reference/python/usearch/index.py:1473-1514), every shard must
  * score with the same global N / df / avgdl for the merged ranking to
  * equal a single-index ranking.
  */
final case class GlobalStats(nDocs: Long, avgdl: Double, dfByTerm: Map[String, Long])

/** Per-query execution counters — the `search_result_t.visited_members` /
  * `computed_distances` analog
  * (/root/reference/include/usearch/index.hpp:2566-2593, accumulated from
  * per-context counters at :3070-3073), backed by Spark accumulators so
  * the counts aggregate across every bucket task of a distributed search:
  *
  *   - `visitedDocs`: candidate documents examined (WAND pivot docs, or
  *     posting entries streamed by the term-at-a-time batch path);
  *   - `scoredDocs`: documents fully scored (the BM25 computation count —
  *     what WAND/BMW pruning actually saved vs `exact = true`).
  *
  * Create one per search (`SearchCounters(spark)`), pass it to
  * `Searcher.search`/`searchMany`, read `.visitedDocs.value` after the
  * action. Task retries can overcount (standard accumulator semantics) —
  * these are observability counters, not results.
  */
final class SearchCounters private (
    val visitedDocs: org.apache.spark.util.LongAccumulator,
    val scoredDocs: org.apache.spark.util.LongAccumulator) extends Serializable

object SearchCounters {
  def apply(spark: org.apache.spark.sql.SparkSession): SearchCounters =
    new SearchCounters(
      spark.sparkContext.longAccumulator("graft.search.visited_docs"),
      spark.sparkContext.longAccumulator("graft.search.scored_docs"))
}
