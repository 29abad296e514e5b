package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Fulltext, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a matching `oracleSql` (DuckDB) unless the
  * operator is not SQL-expressible; column names are aligned on both
  * sides because the driver's compare hashes values under sorted column
  * names.
  */
object SparkEntry {

  /** Flagship: engine-path BM25 top-k over sf0.001 documents. */
  def entry(spark: SparkSession): DataFrame =
    Fulltext.engBm25TopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / Catalyst coverage
    "q1_agg" -> Relational.q1Agg _,
    "q3_top_revenue" -> Relational.q3TopRevenue _,
    "q_window_topn" -> Relational.qWindowTopN _,
    "q_events_daily" -> Relational.qEventsDaily _,
    // fulltext build stages (declarative)
    "ft_tf" -> Fulltext.tfTable _,
    "ft_df" -> Fulltext.dfTable _,
    "ft_stats" -> Fulltext.corpusStats _,
    // BM25 top-k: declarative plan, filtered variant, and the engine
    // (segments + block-max WAND) against the same SQL oracle
    "ft_bm25_topk" -> ((s: SparkSession, d: String) => Fulltext.bm25TopK(s, d)),
    "ft_bm25_filtered" -> ((s: SparkSession, d: String) =>
      Fulltext.bm25TopK(s, d, langFilter = Some("en"))),
    "eng_bm25_topk" -> Fulltext.engBm25TopK _,
    "eng_bm25_exact" -> Fulltext.engBm25Exact _,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_top_revenue" -> Relational.q3TopRevenueSql,
    "q_window_topn" -> Relational.qWindowTopNSql,
    "q_events_daily" -> Relational.qEventsDailySql,
    "ft_tf" -> Fulltext.tfTableSql,
    "ft_df" -> Fulltext.dfTableSql,
    "ft_stats" -> Fulltext.corpusStatsSql,
    "ft_bm25_topk" -> Fulltext.bm25TopKSql(),
    "ft_bm25_filtered" -> Fulltext.bm25TopKSql(langFilter = Some("en")),
    "eng_bm25_topk" -> Fulltext.bm25TopKSql(),
    "eng_bm25_exact" -> Fulltext.bm25TopKSql(),
  )
}
