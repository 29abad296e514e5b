package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, Searcher}
import graft.oracle.ExactScorer

/** The correctness core (north rule): the distributed index + WAND top-k
  * must be rank-identical — docIds AND scores — to the in-memory exact
  * oracle, at any parallelism/bucketing. Analog of usearch's exact-match
  * suite (/root/reference/python/scripts/test_index.py:165-183 self-recall,
  * /root/reference/python/scripts/test_tooling.py:74-100 brute-force oracle).
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 300
  private lazy val docs = CorpusGen.generateLocal(nDocs)
  private lazy val oracle = new ExactScorer(docs.zipWithIndex.map { case (d, i) => (i.toLong, d.content) })

  // deterministic docId = generation index (the generator is a pure
  // function of the id, so this equals the (repo,path,commit)-sort
  // derivation tested separately in DocIdsSpec)
  private def buildIndex(buckets: Int): Searcher = {
    val root = Files.createTempDirectory(s"graft-idx-$buckets-").toString
    val indexed = spark.range(0, nDocs).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")
    IndexBuilder.build(spark, indexed, root, targetBuckets = buckets)
    new Searcher(spark, root)
  }

  private lazy val searcher5 = buildIndex(5)

  private def hits(df: org.apache.spark.sql.DataFrame): Array[(Long, Double)] =
    df.as[(Long, Double)].collect()

  test("sha256 integrity: generator column matches recomputation (input_hint invariant)") {
    val bad = CorpusGen.generate(spark, 100)
      .map(d => (d.sha256, CorpusGen.sha256Hex(d.content)))
      .filter(t => t._1 != t._2)
      .count()
    assert(bad == 0L)
  }

  test("exact path is rank- and score-identical to the in-memory oracle") {
    val queries = CorpusGen.querySet(20)
    queries.foreach { case (qid, q) =>
      val expected = oracle.search(q, 10)
      val got = hits(searcher5.searchExact(q, 10))
      assert(got.length == expected.length, s"q$qid '$q' count")
      got.zip(expected).zipWithIndex.foreach { case (((gd, gs), (ed, es)), r) =>
        assert(gd == ed, s"q$qid '$q' rank $r docId: got $gd want $ed")
        assert(gs == es, s"q$qid '$q' rank $r score: got $gs want $es (must be bit-identical)")
      }
    }
  }

  test("WAND pruned path equals exact path (docIds and scores)") {
    val queries = CorpusGen.querySet(20)
    queries.foreach { case (qid, q) =>
      val exact = hits(searcher5.searchExact(q, 10))
      val wand = hits(searcher5.search(q, 10))
      assert(wand.toSeq == exact.toSeq, s"q$qid '$q'")
    }
  }

  test("results invariant under bucketing/partitioning (parallelism sweep analog)") {
    val searcher3 = buildIndex(3)
    CorpusGen.querySet(10).foreach { case (qid, q) =>
      assert(hits(searcher3.search(q, 10)).toSeq == hits(searcher5.search(q, 10)).toSeq,
        s"q$qid '$q' differs between 3-bucket and 5-bucket layouts")
    }
  }

  test("filtered search ranks within the filtered set (filtered_search analog)") {
    val q = "id0 id1 def"
    val allowSet = (0L until nDocs.toLong).filter(_ % 3 == 0).toSet
    val got = hits(searcher5.search(q, 10, allow = Some(allowSet.contains)))
    assert(got.nonEmpty)
    assert(got.forall { case (d, _) => allowSet.contains(d) })
    // oracle: filter the full exact ranking, then take 10
    val expected = oracle.search(q, nDocs).filter { case (d, _) => allowSet.contains(d) }.take(10)
    assert(got.toSeq == expected.toSeq)
  }

  test("self-recall: a doc queried by its own rarest terms retrieves itself at rank 1") {
    // rarest terms of a doc per oracle df
    (0 until 20).foreach { i =>
      val terms = graft.analyze.Tokenizer.tokenize(docs(i).content).distinct
      val rare = terms.sortBy(t => (oracle.df(t), t)).take(4)
      val got = hits(searcher5.search(rare.mkString(" "), 3))
      val expected = oracle.search(rare.mkString(" "), 3)
      assert(got.toSeq == expected.toSeq, s"doc $i")
      // usearch-style self-recall: the doc appears in its own top results
      assert(expected.take(3).exists(_._1 == i.toLong) == got.take(3).exists(_._1 == i.toLong))
    }
  }

  test("batch searchMany equals per-query search (batched scatter-gather)") {
    val queries = CorpusGen.querySet(15)
    val batch = searcher5.searchMany(queries, 10)
      .select("query_id", "doc_id", "score")
      .as[(Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    queries.foreach { case (qid, q) =>
      val single = hits(searcher5.search(q, 10)).toSeq
      assert(batch.getOrElse(qid, Seq.empty) == single, s"q$qid '$q'")
    }
  }

  test("filtered batch searchMany equals per-query filtered search, dense and fallback") {
    val queries = CorpusGen.querySet(15)
    val allowSet = (0L until nDocs.toLong).filter(_ % 3 == 0).toSet
    val af: Option[Long => Boolean] = Some(allowSet.contains)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "doc_id", "score")
      .as[(Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val dense = rows(searcher5.searchMany(queries, 10, allow = af))
    // 100-byte budget < one 480-byte accumulator row → WAND fallback path
    val viaFallback = rows(searcher5.searchMany(queries, 10, taatBudgetBytes = 100L, allow = af))
    queries.foreach { case (qid, q) =>
      val single = hits(searcher5.search(q, 10, allow = af)).toSeq
      assert(dense.getOrElse(qid, Seq.empty) == single, s"dense q$qid '$q'")
      assert(viaFallback.getOrElse(qid, Seq.empty) == single, s"fallback q$qid '$q'")
      single.foreach { case (d, _) => assert(allowSet.contains(d)) }
    }
  }

  test("hot serving path (searchHot) is bit-identical to the distributed search") {
    val root = Files.createTempDirectory("graft-idx-hot-").toString
    val indexed = spark.range(0, nDocs).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")
    IndexBuilder.build(spark, indexed, root, targetBuckets = 5)
    val hot = new Searcher(spark, root, cacheHot = true)
    val expected = CorpusGen.querySet(15).map { case (qid, q) =>
      (qid, q, hits(searcher5.search(q, 10)).toSeq)
    }
    // cold pass (terms fetched) and warm pass (zero jobs) must both match
    for (_ <- 1 to 2)
      expected.foreach { case (qid, q, want) =>
        val got = hot.searchHot(q, 10).map(h => (h.docId, h.score)).toSeq
        assert(got == want, s"q$qid '$q'")
      }
    // filtered + exact variants flow through the same scoring
    val allowSet = (0L until nDocs.toLong).filter(_ % 3 == 0).toSet
    val q = "id0 id1 def"
    assert(hot.searchHot(q, 10, allow = Some(allowSet.contains)).map(h => (h.docId, h.score)).toSeq ==
      hits(searcher5.search(q, 10, allow = Some(allowSet.contains))).toSeq)
    assert(hot.searchHot(q, 10, exact = true).map(h => (h.docId, h.score)).toSeq ==
      hits(searcher5.searchExact(q, 10)).toSeq)
  }

  test("searchHot under a starvation budget: eviction churns, results stay bit-identical") {
    // a budget too small to keep ANY term resident forces a fetch+evict
    // cycle every query — the worst case for the LRU accounting (encoded
    // + decoded charge, hotDecoded invalidation) — and must only cost
    // latency, never correctness
    val root = Files.createTempDirectory("graft-idx-hot-tiny-").toString
    val indexed = spark.range(0, nDocs).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")
    IndexBuilder.build(spark, indexed, root, targetBuckets = 5)
    val tiny = new Searcher(spark, root, cacheHot = true, hotPostingsBudgetBytes = 1L)
    for (_ <- 1 to 2)
      CorpusGen.querySet(10).foreach { case (qid, q) =>
        val got = tiny.searchHot(q, 10).map(h => (h.docId, h.score)).toSeq
        assert(got == hits(searcher5.search(q, 10)).toSeq, s"q$qid '$q'")
      }
  }

  test("searchHot under concurrent callers: shared LRU stays consistent, results bit-identical") {
    // the serving path's advertised use is concurrent queries against ONE
    // Searcher; searchHot synchronizes the shared access-ordered LRU +
    // byte account, so a storm of threads with a budget small enough to
    // force eviction churn must only serialize, never corrupt. Analog of
    // the reference's concurrent-search coverage
    // (/root/reference/cpp/test.cpp:603 executor_default searches).
    val root = Files.createTempDirectory("graft-idx-hot-conc-").toString
    val indexed = spark.range(0, nDocs).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")
    IndexBuilder.build(spark, indexed, root, targetBuckets = 5)
    // ~64 KB keeps a few terms resident so threads contend on BOTH the
    // hit path (LRU reorder) and the miss path (fetch + evict)
    val hot = new Searcher(spark, root, cacheHot = true,
      hotPostingsBudgetBytes = 64L * 1024)
    val queries = CorpusGen.querySet(15)
    val expected = queries.map { case (qid, q) =>
      (qid, q, hits(searcher5.search(q, 10)).toSeq)
    }
    hot.searchHot(queries.head._2, 10) // materialize dict/doclens once
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try {
          // each thread walks the query set from a different offset so
          // the working sets collide rather than march in lockstep
          for (r <- 0 until 3; i <- expected.indices) {
            val (qid, q, want) = expected((i + t * 2) % expected.length)
            val got = hot.searchHot(q, 10).map(h => (h.docId, h.score)).toSeq
            if (got != want) failures.add(s"thread $t rep $r q$qid '$q'")
          }
        } catch { case e: Throwable => failures.add(s"thread $t threw: $e") }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, failures.toString)
    // and the cache survives the storm: a fresh sequential pass still matches
    expected.foreach { case (qid, q, want) =>
      assert(hot.searchHot(q, 10).map(h => (h.docId, h.score)).toSeq == want, s"post q$qid")
    }
  }

  test("taatBucket honors the memory budget: chunked and WAND-fallback paths equal the default") {
    // 300 docs / 5 buckets → 60 docs/bucket → one accumulator row = 480
    // bytes. A 960-byte budget forces chunk = 2 (exercises the chunk
    // boundary the 32 MB default never hits at test scale); a 100-byte
    // budget cannot fit ONE row and must take the per-query WAND fallback.
    val queries = CorpusGen.querySet(15)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Double)] =
      df.select("query_id", "doc_id", "score").as[(Int, Long, Double)].collect().toSeq
    val default = rows(searcher5.searchMany(queries, 10))
    val chunked = rows(searcher5.searchMany(queries, 10, taatBudgetBytes = 960L))
    val fallback = rows(searcher5.searchMany(queries, 10, taatBudgetBytes = 100L))
    assert(chunked == default, "chunked TAAT diverged from the default path")
    assert(fallback == default, "WAND fallback diverged from the dense TAAT path")
  }

  test("per-query counters: pruned search visits and scores fewer docs than exact") {
    // the search_result_t.visited_members / computed_distances analog
    // (/root/reference/include/usearch/index.hpp:2566-2593)
    val q = "def id0 id1 id2" // hot corpus terms → many candidates, small k
    val cExact = graft.index.SearchCounters(spark)
    val exact = hits(searcher5.search(q, 3, exact = true, counters = Some(cExact)))
    val cPruned = graft.index.SearchCounters(spark)
    val pruned = hits(searcher5.search(q, 3, counters = Some(cPruned)))
    assert(pruned.toSeq == exact.toSeq) // identical results, less work:
    assert(cExact.scoredDocs.value > 0L)
    assert(cPruned.scoredDocs.value < cExact.scoredDocs.value,
      s"pruned scored ${cPruned.scoredDocs.value} !< exact ${cExact.scoredDocs.value}")
    assert(cPruned.visitedDocs.value <= cExact.visitedDocs.value)
  }

  test("auto geometry bounds bucket WIDTH, not count, past the width cap") {
    val cap = IndexBuilder.MaxDefaultBucketWidth
    // small corpora: unchanged parallelism-driven geometry
    assert(IndexBuilder.autoGeometry(300L, 32) == ((5, 60L)))
    assert(IndexBuilder.autoGeometry(1000000L, 32) == ((32, 31250L)))
    // at 10⁹ docs the old formula gave 32 buckets of ~31M docs (a 250 MB
    // accumulator row); now the width pins at 2²⁰ and the count grows
    val (b1, w1) = IndexBuilder.autoGeometry(1000000000L, 32)
    assert(w1 == cap && b1 == ((1000000000L + cap - 1) / cap).toInt)
    // 10¹² docs: width still capped, count still exact (no Int overflow)
    val (b2, w2) = IndexBuilder.autoGeometry(1000000000000L, 32)
    assert(w2 == cap && b2 == ((1000000000000L + cap - 1) / cap).toInt)
    assert(8L * w2 <= graft.index.Searcher.DefaultTaatBudgetBytes)
  }

  test("absent-term query returns empty; empty query returns empty") {
    assert(searcher5.search("zzznotaterm qqqmissing", 10).count() == 0L)
    assert(searcher5.search("", 10).count() == 0L)
  }

  test("checkpoint resume: rebuilding over an existing index is a no-op (and fast)") {
    val root = Files.createTempDirectory("graft-resume-").toString
    val indexed = spark.range(0, 50).map(i => (i, CorpusGen.genDoc(42L, i).content))
      .toDF("doc_id", "content")
    val s1 = IndexBuilder.build(spark, indexed, root, targetBuckets = 2)
    val t0 = System.nanoTime()
    val s2 = IndexBuilder.build(spark, indexed, root, targetBuckets = 2)
    val resumeMs = (System.nanoTime() - t0) / 1000000L
    assert(s1 == s2)
    assert(resumeMs < 5000, s"resume took ${resumeMs}ms — stages were not skipped")
  }
}
