package graft.query

/** BM25 scoring, k1=1.2 b=0.75 (north rule). One implementation shared by
  * the distributed WAND path and the in-memory exact oracle so scores are
  * bit-identical (the reference's exact-search rank-identity contract,
  * /root/reference/include/usearch/index.hpp:4251-4268).
  *
  * idf uses the always-positive Lucene form ln(1 + (N - df + 0.5)/(df + 0.5)).
  * Per-doc score = Σ_{t ∈ sorted unique query terms} idf(t) · tfNorm(t, d);
  * the fixed term order makes double accumulation deterministic, so
  * parallelism cannot change scores (SURVEY.md §7.5.1).
  */
object Bm25 {
  final val K1 = 1.2
  final val B = 0.75

  def idf(df: Long, nDocs: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  /** tf-normalization term — the part of the score that depends only on
    * (tf, docLen); blockMax summaries store the max of this per block, and
    * idf·maxTfNorm is then a valid per-block score upper bound.
    */
  def tfNorm(tf: Int, docLen: Long, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * docLen.toDouble / avgdl))

  def score(tf: Int, df: Long, docLen: Long, nDocs: Long, avgdl: Double): Double =
    idf(df, nDocs) * tfNorm(tf, docLen, avgdl)

  /** SQL fragment (valid in both Spark SQL and DuckDB) for the same score,
    * given column/scalar expressions. Used to build oracle SQL.
    */
  def sqlScore(tf: String, df: String, dl: String, n: String, avgdl: String): String =
    s"ln(1.0 + ($n - $df + 0.5) / ($df + 0.5)) * " +
      s"($tf * (1.2 + 1.0) / ($tf + 1.2 * (1.0 - 0.75 + 0.75 * $dl / $avgdl)))"
}
