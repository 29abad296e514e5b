package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-quality evaluation utilities — the reference's
  * `Matches.recall` / eval helpers
  * (/root/reference/python/usearch/index.py:374-393,
  * /root/reference/python/usearch/eval.py:158-207), as reusable
  * DataFrame ops instead of inline spec arithmetic.
  *
  * Both inputs are ranked result sets with an id column (and a `rank`
  * column where order matters). Recall is returned in integer basis
  * points (exact cross-engine arithmetic, per the repo float rules).
  */
object Eval {

  /** Fixed-point NDCG discount table: `DiscountMicros(r-1)` =
    * round(10⁶ / log₂(r+1)) for rank r — the SAME integer literals are
    * embedded in both the Scala computation and the DuckDB oracle SQL,
    * so NDCG comparisons never depend on two engines' `log` agreeing in
    * the last ulp.
    */
  final val DiscountMicros: IndexedSeq[Long] =
    (1 to 100).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** recall@k of `got` vs `expected` (both top-k id sets): fraction of
    * expected ids present anywhere in got.
    */
  def recallAt(got: DataFrame, expected: DataFrame, idCol: String, k: Int): Double = {
    val hits = got.select(col(idCol))
      .join(expected.select(col(idCol)), idCol).count()
    hits.toDouble / k.toDouble
  }

  /** Single-row (k, recall_bp) DataFrame — recall@k in basis points. */
  def recallBp(spark: SparkSession, got: DataFrame, expected: DataFrame,
      idCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val hits = got.select(col(idCol))
      .join(expected.select(col(idCol)), idCol).count()
    Seq((k, hits * 10000L / k)).toDF("k", "recall_bp")
  }

  /** NDCG@k with binary relevance: `got` must carry (idCol, rank 1-based);
    * relevance 1 iff the id is in `expected`. DCG = Σ rel/log₂(rank+1);
    * ideal DCG assumes all |expected∩top-k| relevant ids ranked first.
    */
  def ndcgAt(got: DataFrame, expected: DataFrame, idCol: String, k: Int): Double = {
    val rel = got.where(col("rank") <= k)
      .join(expected.select(col(idCol)), Seq(idCol))
      .select(col("rank")).collect().map(_.getInt(0)).sorted
    if (rel.isEmpty) return 0.0
    val dcg = rel.map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum
    val n = math.min(rel.length, k)
    val idcg = (1 to n).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum
    dcg / idcg
  }
}
