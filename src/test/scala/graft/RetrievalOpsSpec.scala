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

  test("term vectors: inverted-index reconstruction equals brute tokenize counts") {
    val s = Fulltext.indexFor(spark, dir)
    val ids = Seq(7L, 12L, 42L, 401L)
    val got = s.termVectors(ids).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(ids: _*))
      .collect()
      .flatMap { r =>
        graft.analyze.Tokenizer.tokenize(r.getAs[String]("text"))
          .groupBy(identity).map { case (t, xs) =>
            (r.getAs[Long]("doc_id"), t, xs.length.toLong) }
      }.toSeq.sortBy(x => (x._1, x._2))
    assert(got == want)
    assert(s.termVectors(Seq.empty).count() == 0L)
  }

  test("percolate: conjunctive matches equal brute token-set containment") {
    val arrivals = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 17 === 0)
    val got = Fulltext.percolate(spark, arrivals, Fulltext.PercolateQueries)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val docSets = arrivals.collect().map(r =>
      r.getAs[Long]("doc_id") ->
        graft.analyze.Tokenizer.tokenize(r.getAs[String]("text")).toSet).toSeq
    val want = (for {
      (qid, ts) <- Fulltext.PercolateQueries
      norm = ts.flatMap(graft.analyze.Tokenizer.tokenize).distinct
      (d, toks) <- docSets
      if norm.nonEmpty && norm.forall(toks)
    } yield (qid, d)).sortBy(identity)
    assert(got == want)
    assert(want.exists(_._1 == 0), "vacuous percolate fixture")
    assert(!want.exists(_._1 == 3), "absent-term canary matched")
  }

  test("suggest: ranked edit ball equals brute dictionary sweep; exact hit ranks first") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.suggestMany(Fulltext.SuggestProbes, n = 5).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3), r.getLong(4)))
      .toSeq
    // brute dictionary: tokenize the corpus, df = docs containing the term,
    // UNBOUNDED reference DP, the same (dist, -df, term) rank
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val dict = spark.read.parquet(s"$dir/documents.parquet").collect()
      .flatMap(r => graft.analyze.Tokenizer.tokenize(r.getAs[String]("text"))
        .distinct.map(_ -> r.getAs[Long]("doc_id")))
      .groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val want = Fulltext.SuggestProbes.flatMap { case (qid, p) =>
      val q = graft.analyze.Tokenizer.tokenize(p).head
      dict.toSeq.map { case (t, df) => (t, lev(t, q), df) }
        .filter(_._2 <= 2)
        .sortBy { case (t, d, df) => (d, -df, t) }
        .take(5).zipWithIndex
        .map { case ((t, d, df), i) => (qid, i + 1, t, d, df) }
    }.sortBy(x => (x._1, x._2))
    assert(got == want)
    assert(got.exists(x => x._1 == 2 && x._2 == 1 && x._3 == "spark" && x._4 == 0),
      "exact dictionary hit must rank first at distance 0")
    assert(!got.exists(_._1 == 4), "gibberish canary found suggestions")
    assert(Fulltext.SuggestProbes.indices.dropRight(1)
      .forall(q => got.exists(_._1 == q)), "a live probe returned nothing")
  }

  test("collocations: positional followers equal brute bigram counts") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.followersMany(Fulltext.CollocationSeeds, n = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    val seeds = Fulltext.CollocationSeeds
      .flatMap(graft.analyze.Tokenizer.tokenize).distinct.toSet
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    spark.read.parquet(s"$dir/documents.parquet").collect().foreach { r =>
      val toks = graft.analyze.Tokenizer.tokenize(r.getAs[String]("text"))
      for (i <- 0 until toks.length - 1 if seeds(toks(i))) {
        val k = (toks(i), toks(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + 1L
      }
    }
    val want = counts.toSeq.groupBy(_._1._1).toSeq.flatMap { case (seed, xs) =>
      xs.map { case ((_, f), n) => (f, n) }
        .sortBy { case (f, n) => (-n, f) }.take(5).zipWithIndex
        .map { case ((f, n), i) => (seed, i + 1, f, n) }
    }.sortBy(x => (x._1, x._2))
    assert(got == want)
    assert(!got.exists(_._1 == "zzznope"), "dict-absent seed produced rows")
    assert(got.map(_._1).distinct.size == 3, "a live seed returned nothing")
  }

  test("significant terms: index decode + semi-join equals brute contrast ranking") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.significantTerms(Fulltext.RefQuery, n = 15).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        graft.analyze.Tokenizer.tokenize(r.getAs[String]("text")).toSet)
    val qset = Fulltext.RefQuery.toSet
    val mdocs = docs.filter { case (_, ts) => ts.exists(qset) }
    val bg = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val fgAll = mdocs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val want = fgAll.toSeq.filter(_._2 >= 2L)
      .map { case (t, dfg) => (t, dfg, bg(t), 10000L * dfg / bg(t)) }
      .sortBy { case (t, dfg, _, bp) => (-bp, -dfg, t) }
      .take(15).zipWithIndex
      .map { case ((t, dfg, df, bp), i) => (t, dfg, df, bp, i + 1) }
    assert(got == want)
    // the query's own present terms sit at share 10000
    assert(got.takeWhile(_._4 == 10000L).map(_._1).toSet.intersect(qset).nonEmpty)
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
