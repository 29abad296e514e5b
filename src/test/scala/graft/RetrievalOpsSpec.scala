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

  test("explain: raw parts fold to the exact search score; tf/df match the tables") {
    val s = Fulltext.indexFor(spark, dir)
    val q = Fulltext.RefQuery.mkString(" ")
    val ex = s.explain(q, Fulltext.K).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(ex.nonEmpty)
    val hits = s.search(q, Fulltext.K).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val byDoc = ex.groupBy(_._2)
    assert(byDoc.keySet == hits.map(_._1).toSet, "explain docs != search docs")
    // ranks and totals are search's, verbatim
    hits.zipWithIndex.foreach { case ((d, sc), i) =>
      assert(byDoc(d).forall(r => r._1 == i + 1 && r._7 == sc)) }
    // the sorted-term left fold of raw parts reconstructs each score
    // bit-for-bit — the same accumulation the scorer ran
    for ((d, sc) <- hits) {
      val fold = byDoc(d).sortBy(_._3).map(_._6).foldLeft(0.0)(_ + _)
      assert(fold == sc, s"doc $d: part fold $fold != score $sc")
    }
    // tf/df columns equal the declarative tables (and every present
    // (doc, term) pair appears — no dropped rows)
    val tfTab = Fulltext.tfTable(spark, dir)
      .where(col("doc_id").isin(hits.map(_._1): _*) &&
        col("term").isin(Fulltext.RefQuery: _*))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ex.map(r => (r._2, r._3)).toSet == tfTab.keySet)
    assert(ex.forall(r => tfTab((r._2, r._3)) == r._4))
    val dfTab = Fulltext.dfTable(spark, dir)
      .where(col("term").isin(Fulltext.RefQuery: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ex.forall(r => dfTab(r._3) == r._5))
  }
}
