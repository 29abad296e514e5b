package graft

import org.apache.spark.sql.functions._

import graft.ops.{Fulltext, TextAnalysis}

/** Index-assisted retrieval ops: the contamination phrase scan must
  * equal a brute-force full-corpus substring scan while sourcing its
  * candidates from pruned posting reads, and more-like-this (engine
  * WAND over rarest-first selected terms) must equal the declarative
  * Catalyst BM25 plan over the same terms.
  */
class RetrievalOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("contamination scan == brute-force substring scan over normalized text") {
    val got = TextAnalysis.contamination(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(lit(" "),
          array_join(graft.analyze.Tokenizer.tokensCol(col("text")), " "),
          lit(" ")).as("ntext"))
    val expected = TextAnalysis.ContaminationProbes.zipWithIndex.flatMap {
      case (p, i) =>
        docs.where(col("ntext").contains(s" $p "))
          .select(col("doc_id")).collect().map(r => (i, r.getLong(0)))
    }.sortBy(identity)
    assert(got == expected)
    assert(got.nonEmpty, "no probe hit anything — vacuous fixture")
    // the canary probe's terms never entered the dictionary
    assert(!got.exists(_._1 == 3), "dictionary-absent probe matched docs")
  }

  test("contamination candidates come from pruned posting reads, not a corpus scan") {
    val s = Fulltext.indexFor(spark, dir)
    val plan = s.postingDocIds(Seq("key", "agg", "row"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"), s"no term pushdown in:\n$plan")
  }

  test("more-like-this: engine WAND == declarative BM25 over the same selected terms") {
    val qDoc = 0L
    // recompute the rarest-first selection from the declarative tables
    val tfq = Fulltext.tfTable(spark, dir).where(col("doc_id") === qDoc)
      .select(col("term"), col("tf")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfs = Fulltext.dfTable(spark, dir)
      .where(col("term").isin(tfq.keys.toSeq: _*)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = tfq.keys.toSeq
      .map(t => (dfs(t), -tfq(t), t)).sorted.take(5).map(_._3)
    val declarative = Fulltext.bm25TopK(spark, dir, queryTerms = sel, k = Fulltext.K + 1)
      .collect().filter(_.getLong(0) != qDoc).take(Fulltext.K)
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val engine = Fulltext.engMoreLikeThis(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(engine.nonEmpty)
    assert(!engine.exists(_._1 == qDoc), "query doc leaked into its own result")
    assert(engine == declarative)
  }
}
