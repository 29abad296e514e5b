package graft

import java.nio.file.Files

import graft.analyze.Tokenizer
import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, Searcher}
import graft.query.Bm25

/** The three round-5 retrieval modes vs driver-side brute force:
  * proximity (minimal covering window from the positions sidecar),
  * conjunctive AND-semantics BM25, and dictionary-driven prefix search.
  * Same bit-identity discipline as EngineSpec/PhraseSpec — docIds AND
  * double scores must match the independent in-memory computation.
  */
class RetrievalModesSpec extends SparkSpec {
  import spark.implicits._

  // ---- shared fixture --------------------------------------------------

  private lazy val genDocs: Seq[(Long, String)] =
    (0 until 300).map(i => i.toLong -> CorpusGen.genDoc(42L, i.toLong).content)

  private def buildPositional(docs: Seq[(Long, String)], buckets: Int): Searcher = {
    val root = Files.createTempDirectory("graft-idx-rm-").toString
    val df = docs.toDF("doc_id", "content")
    IndexBuilder.build(spark, df, root, targetBuckets = buckets)
    IndexBuilder.buildPositions(spark, df, root)
    new Searcher(spark, root)
  }

  // ---- proximity -------------------------------------------------------

  /** Brute-force minimal window BY THE DEFINITION: min over all m-tuples
    * (one position per distinct term) of (max − min + 1), leftmost start
    * among minimal tuples — enumerated tuple-by-tuple, independent of the
    * engine's k-list sweep.
    */
  private def bruteProximity(
      docs: Seq[(Long, String)],
      queries: Seq[(Int, String, Int)]): Seq[(Int, Long, Long, Long)] =
    for {
      (qid, q, w) <- queries.sortBy(_._1)
      ts = Tokenizer.tokenize(q).distinct.sorted
      if ts.nonEmpty
      (docId, text) <- docs.sortBy(_._1)
      toks = Tokenizer.tokenize(text)
      lists = ts.map(t => toks.indices.filter(i => toks(i) == t))
      if lists.forall(_.nonEmpty)
      tuples = lists.foldLeft(Seq(Seq.empty[Int]))((acc, l) =>
        acc.flatMap(pre => l.map(pre :+ _)))
      best = tuples.map(tp => ((tp.max - tp.min + 1).toLong, tp.min.toLong)).min
      if best._1 <= w
    } yield (qid, docId, best._1, best._2)

  private def runProx(s: Searcher, qs: Seq[(Int, String, Int)]): Seq[(Int, Long, Long, Long)] =
    s.proximityMany(qs).as[(Int, Long, Long, Long)].collect().toSeq

  test("proximity: crafted corpus — spans, leftmost ties, absent terms") {
    val docs: Seq[(Long, String)] = Seq(
      0L -> "a x x b y a b",        // (a,b): tuples incl (5,6) span 2; leftmost min
      1L -> "b a",                  // order-free: span 2 start 0
      2L -> "a x x x x x b",        // span 7 — fails window 5, passes 7
      3L -> "a b c a c b",          // 3-term windows
      4L -> "c c c a b",            // (a,b,c) span 3 start 2
      5L -> "a only here",
      6L -> "b only here")
    val queries = Seq(
      (0, "a b", 5),
      (1, "a b", 7),
      (2, "a b c", 4),
      (3, "a zzz", 9))              // dictionary-absent → dies at planning
    val s = buildPositional(docs, buckets = 3)
    val got = runProx(s, queries)
    val want = bruteProximity(docs, queries)
    assert(got == want, s"proximity diverged:\n got=$got\nwant=$want")
    // hand-pinned hearts (guard the brute force itself)
    assert(want.contains((0, 0L, 2L, 5L)), "tight window / leftmost-start case lost")
    assert(want.contains((0, 1L, 2L, 0L)), "order-free case lost")
    assert(!want.exists(t => t._1 == 0 && t._2 == 2L) &&
      want.contains((1, 2L, 7L, 0L)), "window threshold case lost")
    assert(want.contains((2, 4L, 3L, 2L)), "3-term case lost")
    assert(!want.exists(_._1 == 3), "absent-term query leaked")
  }

  test("proximity: generated corpus across buckets equals brute force; monotone in window") {
    val queries = Seq((0, "def class", 6), (1, "import return static", 10), (2, "val object", 12))
    val s = buildPositional(genDocs, buckets = 5)
    val got = runProx(s, queries)
    val want = bruteProximity(genDocs, queries)
    assert(want.nonEmpty, "vacuous fixture: no proximity hits")
    assert(got == want)
    // widening every window can only add rows, never change shared ones
    val wide = runProx(s, queries.map { case (id, q, w) => (id, q, w + 5) })
    val gotSet = got.toSet
    assert(gotSet.subsetOf(wide.toSet), "widened window lost hits")
  }

  // ---- conjunctive (AND) BM25 ------------------------------------------

  /** Brute-force conjunctive top-k: docs containing EVERY query term,
    * scored by the same sorted-term left fold as [[Bm25]], ordered
    * (score desc, docId asc), first k — doubles compared exactly.
    */
  private def bruteConjunctive(
      docs: Seq[(Long, String)],
      queries: Seq[(Int, String)],
      k: Int): Seq[(Int, Long, Double)] = {
    val toks = docs.map { case (id, t) => (id, Tokenizer.tokenize(t)) }
    val nDocs = docs.length.toLong
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / nDocs.toDouble
    val df = toks.flatMap(_._2.distinct).groupBy(identity).map { case (t, l) => t -> l.length.toLong }
    queries.sortBy(_._1).flatMap { case (qid, q) =>
      val ts = Tokenizer.tokenize(q).distinct.sorted
      if (!ts.forall(df.contains)) Seq.empty
      else {
        val hits = toks.flatMap { case (id, tk) =>
          val tf = tk.groupBy(identity).map { case (t, l) => t -> l.length }
          if (!ts.forall(tf.contains)) None
          else {
            var s = 0.0
            ts.foreach(t => s += Bm25.idf(df(t), nDocs) * Bm25.tfNorm(tf(t), tk.length.toLong, avgdl))
            Some((id, s))
          }
        }
        hits.sortBy { case (id, s) => (-s, id) }.take(k).map { case (id, s) => (qid, id, s) }
      }
    }
  }

  test("conjunctive AND: bit-identical to brute force; absent term kills the query") {
    val queries = Seq((0, "class import return"), (1, "def val"), (2, "class zzzz"))
    val k = 10
    val s = buildPositional(genDocs, buckets = 5)
    val got = s.searchConjunctiveMany(queries, k)
      .select("query_id", "doc_id", "score")
      .as[(Int, Long, Double)].collect().toSeq
    val want = bruteConjunctive(genDocs, queries, k)
    assert(want.count(_._1 == 0) == k && want.exists(_._1 == 1),
      "vacuous fixture: conjunctive queries found nothing")
    assert(!want.exists(_._1 == 2) && !got.exists(_._1 == 2),
      "absent-term query must be dead at planning")
    assert(got == want, s"conjunctive diverged:\n got=$got\nwant=$want")
  }

  test("conjunctive scores equal the disjunctive path's for the same doc") {
    val s = buildPositional(genDocs, buckets = 5)
    val conj = s.searchConjunctiveMany(Seq((0, "class import return")), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // exact disjunctive scoring ranks every matching doc; conjunctive
    // hits must appear there with the IDENTICAL double score
    val dis = s.searchExact("class import return", 300)
      .as[(Long, Double)].collect().toMap
    conj.foreach { case (d, sc) =>
      assert(dis.get(d).contains(sc), s"doc $d: conjunctive $sc != disjunctive ${dis.get(d)}")
    }
  }

  // ---- multi-generation --------------------------------------------------

  test("multi-gen conjunctive/proximity/phrase equal the single union index") {
    val (genA, genB) = genDocs.partition(_._1 < 150)
    def buildGen(docs: Seq[(Long, String)]): String = {
      val root = Files.createTempDirectory("graft-idx-rmgen-").toString
      val df = docs.toDF("doc_id", "content")
      IndexBuilder.build(spark, df, root, targetBuckets = 3)
      IndexBuilder.buildPositions(spark, df, root)
      root
    }
    val multi = new graft.index.MultiSearcher(spark,
      Seq(buildGen(genA), buildGen(genB)))
    val single = buildPositional(genDocs, buckets = 5)

    val qs = Seq((0, "class import return"), (1, "def val"))
    val mConj = multi.searchConjunctiveMany(qs, 10)
      .as[(Int, Long, Double, Int)].collect().toSeq
    val sConj = single.searchConjunctiveMany(qs, 10)
      .as[(Int, Long, Double, Int)].collect().toSeq
    assert(mConj.nonEmpty && mConj == sConj, "multi-gen conjunctive diverged")

    val pq = Seq((0, "def class", 6), (1, "import return static", 10))
    val mProx = multi.proximityMany(pq).as[(Int, Long, Long, Long)].collect().toSeq
    val sProx = single.proximityMany(pq).as[(Int, Long, Long, Long)].collect().toSeq
    assert(mProx.nonEmpty && mProx == sProx, "multi-gen proximity diverged")

    val ph = Seq((0, "def class"), (1, "import return"))
    val mPh = multi.phraseMany(ph).as[(Int, Long, Long)].collect().toSeq
    val sPh = single.phraseMany(ph).as[(Int, Long, Long)].collect().toSeq
    assert(mPh == sPh, "multi-gen phrase diverged")
  }

  // ---- snippets ----------------------------------------------------------

  test("snippets: conjunctive hits carry the brute-force minimal window, losslessly") {
    val queries = Seq((0, "class import return"), (1, "def val"))
    val k = 10
    val s = buildPositional(genDocs, buckets = 5)
    val got = s.snippetMany(queries, k)
      .select("query_id", "doc_id", "score", "snippet_start", "snippet_len")
      .as[(Int, Long, Double, Long, Long)].collect().toSeq
    val conj = bruteConjunctive(genDocs, queries, k)
    assert(got.size == conj.size, "snippet join dropped or duplicated conjunctive hits")
    // windows: proximity brute force with no cap, restricted to the hits
    val prox = bruteProximity(genDocs,
      queries.map { case (id, q) => (id, q, Int.MaxValue) })
      .map { case (qid, d, span, start) => (qid, d) -> (start, span) }.toMap
    got.foreach { case (qid, d, sc, start, len) =>
      assert(conj.contains((qid, d, sc)), s"hit ($qid,$d,$sc) not in conjunctive brute force")
      assert(prox((qid, d)) == ((start, len)), s"window for ($qid,$d): got ($start,$len)")
    }
  }

  // ---- prefix search ----------------------------------------------------

  test("prefix search equals disjunctive search over the corpus-derived expansion") {
    val s = buildPositional(genDocs, buckets = 5)
    val expansion = genDocs.flatMap(d => Tokenizer.tokenize(d._2))
      .distinct.filter(_.startsWith("s")).sorted
    assert(expansion.size >= 2, s"vacuous fixture: prefix expands to $expansion")
    val got = s.searchPrefix("s", 10).as[(Long, Double)].collect().toSeq
    val want = s.search(expansion.mkString(" "), 10).as[(Long, Double)].collect().toSeq
    assert(got == want)
    // over-wide expansion fails loudly instead of scanning
    val e = intercept[IllegalArgumentException](s.searchPrefix("s", 10, maxExpansion = 1))
    assert(e.getMessage.contains("expands to"))
    // no matching term → empty result, no job storm
    assert(s.searchPrefix("zzzz", 10).count() == 0L)
  }

  // ---- fuzzy -------------------------------------------------------------

  test("fuzzy search equals disjunctive search over the brute-force expansion") {
    val s = buildPositional(genDocs, buckets = 5)
    val dict = genDocs.flatMap(d => Tokenizer.tokenize(d._2)).distinct.sorted
    // guard the driver-side DP itself with hand-pinned distances
    assert(Searcher.levWithin("clas", "clas", 0))
    assert(Searcher.levWithin("clas", "class", 1) && !Searcher.levWithin("clas", "class", 0))
    assert(Searcher.levWithin("val", "case", 3) && !Searcher.levWithin("val", "case", 2))
    assert(!Searcher.levWithin("zzzz", "class", 3))
    for ((probe, d) <- Seq(("clas", 1), ("impor", 1), ("id10", 1))) {
      val expansion = dict.filter(t => Searcher.levWithin(t, probe, d))
      assert(expansion.nonEmpty, s"vacuous fixture: $probe~$d expands to nothing")
      val got = s.searchFuzzy(probe, 10, maxDist = d).as[(Long, Double)].collect().toSeq
      val want = s.search(expansion.mkString(" "), 10).as[(Long, Double)].collect().toSeq
      assert(got == want, s"fuzzy $probe~$d diverged")
    }
    // empty expansion → empty result, no job storm; loud over-expansion
    assert(s.searchFuzzy("zzzz", 10, maxDist = 1).count() == 0L)
    val e = intercept[IllegalArgumentException](
      s.searchFuzzy("id10", 10, maxDist = 1, maxExpansion = 1))
    assert(e.getMessage.contains("expands to"))
  }

  test("batched fuzzy (one dict scan + one TAAT pass) equals per-probe fuzzy") {
    val s = buildPositional(genDocs, buckets = 5)
    val probes = Seq((0, "clas", 1), (1, "impor", 1), (2, "id10", 1), (3, "zzzz", 1))
    val batched = s.searchFuzzyMany(probes, 10)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Int, Long, Double, Int)].collect().toSeq
    val per = probes.flatMap { case (qid, p, d) =>
      s.searchFuzzy(p, 10, maxDist = d).as[(Long, Double)].collect().toSeq
        .zipWithIndex.map { case ((doc, sc), i) => (qid, doc, sc, i + 1) }
    }
    assert(batched.nonEmpty && batched.sorted == per.sorted,
      "batched fuzzy diverged from per-probe fuzzy")
    // the dead probe contributes no rows; over-expansion still fails loudly
    assert(!batched.exists(_._1 == 3))
    val e = intercept[IllegalArgumentException](
      s.searchFuzzyMany(Seq((0, "id10", 1)), 10, maxExpansion = 1))
    assert(e.getMessage.contains("expands to"))
  }

  test("wildcard search equals disjunctive search over the brute expansion") {
    val s = buildPositional(genDocs, buckets = 5)
    val vocab = genDocs.flatMap { case (_, t) => Tokenizer.tokenize(t) }.distinct
    for (pat <- Seq("*t", "c*s", "*a*", "de*", "*turn")) {
      val rx = "^" + pat.replace("*", ".*") + "$"
      val expanded = vocab.filter(_.matches(rx)).sorted
      val got = s.searchWildcard(pat, 10).as[(Long, Double)].collect().toSeq
      if (expanded.isEmpty) assert(got.isEmpty, s"'$pat' should be dead")
      else {
        val want = s.search(expanded.mkString(" "), 10)
          .as[(Long, Double)].collect().toSeq
        assert(want.nonEmpty, s"vacuous wildcard fixture '$pat'")
        assert(got == want, s"wildcard '$pat' diverged")
      }
    }
    // over-expansion and no-literal patterns fail loudly
    val e = intercept[IllegalArgumentException](s.searchWildcard("*a*", 10, maxExpansion = 1))
    assert(e.getMessage.contains("expands to"))
    intercept[IllegalArgumentException](s.searchWildcard("**", 10))
    intercept[IllegalArgumentException](s.searchWildcard("", 10))
  }

  test("regexp search equals disjunctive search over the brute expansion") {
    val s = buildPositional(genDocs, buckets = 5)
    val vocab = genDocs.flatMap { case (_, t) => Tokenizer.tokenize(t) }.distinct
    // alternation (keeps pushdown head), class, dot, quantified tail,
    // optional-last-literal head (de? → head "d"), dead canary
    for (pat <- Seq("s(elf|tatic)", "[cv]a(se|l)", "ne.", "ret.*", "de?f", "zzz+")) {
      val expanded = vocab.filter(_.matches("^(" + pat + ")$")).sorted
      val got = s.searchRegexp(pat, 10).as[(Long, Double)].collect().toSeq
      if (expanded.isEmpty) assert(got.isEmpty, s"'$pat' should be dead")
      else {
        val want = s.search(expanded.mkString(" "), 10)
          .as[(Long, Double)].collect().toSeq
        assert(want.nonEmpty, s"vacuous regexp fixture '$pat'")
        assert(got == want, s"regexp '$pat' diverged")
      }
    }
    // over-expansion and out-of-grammar patterns fail loudly
    val e = intercept[IllegalArgumentException](s.searchRegexp(".*", 10, maxExpansion = 1))
    assert(e.getMessage.contains("expands to"))
    intercept[IllegalArgumentException](s.searchRegexp("a{2}", 10))
    intercept[IllegalArgumentException](s.searchRegexp("A*", 10))
  }

  // ---- search-after pagination -------------------------------------------

  test("searchAfter: page p+1 bit-identical to deep-search slice; hot path agrees") {
    val root = Files.createTempDirectory("graft-idx-sa-").toString
    IndexBuilder.build(spark, genDocs.toDF("doc_id", "content"), root, targetBuckets = 5)
    val s = new Searcher(spark, root)
    val hot = new Searcher(spark, root, cacheHot = true)
    // query = the corpus's own three hottest tokens, so ≥ 5 pages exist
    val q = genDocs.flatMap { case (_, t) => Tokenizer.tokenize(t) }
      .groupBy(identity).toSeq
      .sortBy { case (t, xs) => (-xs.size, t) }
      .take(3).map(_._1).mkString(" ")
    val k = 7
    val deep = s.search(q, 5 * k).as[(Long, Double)].collect().toSeq
    assert(deep.size == 5 * k, "fixture too small for 5 pages")
    var cursor = (deep(k - 1)._2, deep(k - 1)._1)
    for (page <- 1 until 5) {
      val want = deep.slice(page * k, (page + 1) * k)
      val got = s.searchAfter(q, k, cursor).as[(Long, Double)].collect().toSeq
      assert(got == want, s"page ${page + 1} diverged from the deep slice")
      val gotHot = hot.searchHot(q, k, after = Some(cursor))
        .map(h => (h.docId, h.score)).toSeq
      assert(gotHot == got, s"hot page ${page + 1} diverged")
      cursor = (got.last._2, got.last._1)
    }
    // a cursor that ties the score mid-run resumes strictly after its id:
    // re-paging from EVERY row of the deep ranking must reproduce the rest
    for (i <- deep.indices.take(2 * k)) {
      val next = s.searchAfter(q, 3, (deep(i)._2, deep(i)._1))
        .as[(Long, Double)].collect().toSeq
      assert(next == deep.slice(i + 1, i + 4), s"resume from rank ${i + 1} diverged")
    }
    // past-the-end cursor → empty page
    assert(s.searchAfter(q, k, (Double.NegativeInfinity, Long.MaxValue)).count() == 0L)
    // resuming after the deep tail returns only strictly-after rows
    val last = deep.last
    val tail = s.searchAfter(q, 5 * k, (last._2, last._1)).as[(Long, Double)].collect()
    assert(tail.forall { case (d, sc) => sc < last._2 || (sc == last._2 && d > last._1) })
  }

  // ---- synonym groups ------------------------------------------------------

  test("minimum-should-match: m=1 == disjunctive, m=n == conjunctive, mid-m == brute force") {
    val s = buildPositional(genDocs, buckets = 5)
    val q = "def return import"
    val terms = Tokenizer.tokenize(q).distinct.sorted
    def msm(m: Int): Seq[(Long, Double)] =
      s.searchMinMatchMany(Seq((0, q, m)), 10)
        .select("doc_id", "score").as[(Long, Double)].collect().toSeq

    // endpoints: the survivor sets coincide and the fold is identical
    assert(msm(1) == s.search(q, 10).as[(Long, Double)].collect().toSeq,
      "m=1 != disjunctive search")
    assert(msm(terms.size) ==
      s.searchConjunctiveMany(Seq((0, q)), 10)
        .select("doc_id", "score").as[(Long, Double)].collect().toSeq,
      "m=n != conjunctive search")

    // mid threshold against brute force
    val n = genDocs.size.toLong
    val tfByDoc = genDocs.map { case (d, t) =>
      d -> Tokenizer.tokenize(t).groupBy(identity).map { case (w, xs) => w -> xs.length }
    }.toMap
    val dls = genDocs.map { case (d, t) => d -> Tokenizer.tokenize(t).length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val dfOf = tfByDoc.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val brute2 = genDocs.map(_._1).flatMap { d =>
      val present = terms.filter(t => tfByDoc(d).getOrElse(t, 0) > 0)
      if (present.size < 2) None
      else {
        var sc = 0.0
        for (t <- present)
          sc += Bm25.idf(dfOf(t), n) * Bm25.tfNorm(tfByDoc(d)(t), dls(d), avgdl)
        Some((d, sc))
      }
    }.sortBy { case (d, sc) => (-sc, d) }.take(10)
    assert(msm(2) == brute2, "m=2 diverged from brute force")
    assert(msm(2).nonEmpty)

    // a dead term lowers the achievable count; under-threshold is empty
    val withDead = s.searchMinMatchMany(Seq((0, "def zzznope return", 2)), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    val conjTwo = s.searchConjunctiveMany(Seq((0, "def return")), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(withDead == conjTwo, "dead term did not lower the pool to the survivors")
    assert(s.searchMinMatchMany(Seq((0, "zzznope def", 2)), 10).count() == 0L)
    intercept[IllegalArgumentException](s.searchMinMatchMany(Seq((0, q, 0)), 10))
  }

  test("searchBoosted: bit-identical to the weighted brute force; unit boosts == plain search") {
    val s = buildPositional(genDocs, buckets = 5)
    val n = genDocs.size.toLong
    val tfByDoc: Map[Long, Map[String, Int]] = genDocs.map { case (d, t) =>
      d -> Tokenizer.tokenize(t).groupBy(identity).map { case (w, xs) => w -> xs.length }
    }.toMap
    val dls = genDocs.map { case (d, t) => d -> Tokenizer.tokenize(t).length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val dfOf: Map[String, Long] = tfByDoc.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }

    def brute(weights: Seq[(String, Double)], k: Int): Seq[(Long, Double)] = {
      val live = weights.map { case (t, w) => (Tokenizer.tokenize(t).head, w) }
        .sortBy(_._1).filter { case (t, _) => dfOf.contains(t) }
      genDocs.map(_._1).flatMap { d =>
        var sc = 0.0
        var any = false
        for ((t, w) <- live) {
          val tf = tfByDoc(d).getOrElse(t, 0)
          if (tf > 0) {
            any = true
            sc += w * (Bm25.idf(dfOf(t), n) * Bm25.tfNorm(tf, dls(d), avgdl))
          }
        }
        if (any) Some((d, sc)) else None
      }.sortBy { case (d, sc) => (-sc, d) }.take(k)
    }

    val boosts = Seq(("merge", 2.0), ("scan", 0.5), ("the", 1.0), ("zzznope", 3.0))
    val got = s.searchBoosted(boosts, 12).as[(Long, Double)].collect().toSeq
    assert(got == brute(boosts, 12), "boosted top-k diverged from brute force")
    assert(got.nonEmpty)

    // all-unit boosts are bit-identical to the plain disjunctive search
    // (1.0 · x is IEEE-exact — pins the shared weighted core refactor)
    val unit = s.searchBoosted(Seq(("merge", 1.0), ("scan", 1.0)), 10)
      .as[(Long, Double)].collect().toSeq
    val plain = s.search("merge scan", 10).as[(Long, Double)].collect().toSeq
    assert(unit == plain, "unit-boost query != plain search")

    // duplicate terms and non-positive boosts fail loudly
    intercept[IllegalArgumentException](s.searchBoosted(Seq(("merge", 1.0), ("merge", 2.0)), 5))
    intercept[IllegalArgumentException](s.searchBoosted(Seq(("merge", 0.0)), 5))
  }

  test("searchSynonym: bit-identical to the SynonymQuery brute force; edge rules") {
    val s = buildPositional(genDocs, buckets = 5)
    val n = genDocs.size.toLong
    val tfByDoc: Map[Long, Map[String, Int]] = genDocs.map { case (d, t) =>
      d -> Tokenizer.tokenize(t).groupBy(identity).map { case (w, xs) => w -> xs.length }
    }.toMap
    val dls = genDocs.map { case (d, t) => d -> Tokenizer.tokenize(t).length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val dfOf: Map[String, Long] = tfByDoc.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }

    def brute(groups: Seq[Seq[String]], k: Int): Seq[(Long, Double)] = {
      val norm = groups.map(_.flatMap(Tokenizer.tokenize).distinct.sorted)
        .filter(_.nonEmpty).sortBy(_.head)
        .map(_.filter(dfOf.contains)).filter(_.nonEmpty)
      val idfs = norm.map(g => Bm25.idf(g.map(dfOf).max, n))
      genDocs.map(_._1).flatMap { d =>
        var sc = 0.0
        var any = false
        for ((g, i) <- norm.zipWithIndex) {
          val tf = g.map(t => tfByDoc(d).getOrElse(t, 0)).sum
          if (tf > 0) { any = true; sc += idfs(i) * Bm25.tfNorm(tf, dls(d), avgdl) }
        }
        if (any) Some((d, sc)) else None
      }.sortBy { case (d, sc) => (-sc, d) }.take(k)
    }

    val groups = Seq(Seq("merge", "scan"), Seq("the"), Seq("zzznope", "sort"))
    val got = s.searchSynonym(groups, 12).as[(Long, Double)].collect().toSeq
    assert(got == brute(groups, 12), "synonym top-k diverged from brute force")
    assert(got.nonEmpty)

    // a singleton group is bit-identical to the plain term query
    val one = s.searchSynonym(Seq(Seq("merge")), 10).as[(Long, Double)].collect().toSeq
    val plain = s.search("merge", 10).as[(Long, Double)].collect().toSeq
    assert(one == plain, "singleton synonym group != plain term search")

    // fully-dead group contributes nothing; all-dead query is empty
    val withDead = s.searchSynonym(Seq(Seq("merge", "scan"), Seq("qqq", "zzz")), 10)
      .as[(Long, Double)].collect().toSeq
    val noDead = s.searchSynonym(Seq(Seq("merge", "scan")), 10)
      .as[(Long, Double)].collect().toSeq
    assert(withDead == noDead)
    assert(s.searchSynonym(Seq(Seq("qqq")), 10).count() == 0L)

    // overlapping groups fail loudly
    intercept[IllegalArgumentException](
      s.searchSynonym(Seq(Seq("merge", "scan"), Seq("scan")), 10))
  }

  // ---- boolean NOT -------------------------------------------------------

  test("AND-NOT: bit-identical to the filtered-exact oracle; neg resolution rules") {
    val s = buildPositional(genDocs, buckets = 5)
    val oracle = new graft.oracle.ExactScorer(genDocs.toIndexedSeq)
    def excludedBy(neg: String): Set[Long] = {
      val nts = Tokenizer.tokenize(neg).distinct.toSet
      genDocs.filter(d => Tokenizer.tokenize(d._2).exists(nts)).map(_._1).toSet
    }
    for ((pos, neg) <- Seq(
        ("def class import", "lambda"),
        ("static void", "struct include"),
        ("class import return", "return"))) {  // overlap: negation wins per-term
      val excl = excludedBy(neg)
      val negSet = Tokenizer.tokenize(neg).distinct.toSet
      val effPos = Tokenizer.tokenize(pos).distinct.filterNot(negSet).mkString(" ")
      val want = oracle.search(effPos, genDocs.size)
        .filterNot(h => excl(h._1)).take(10).toSeq
      val got = s.searchNot(pos, neg, 10).as[(Long, Double)].collect().toSeq
      assert(got == want, s"searchNot($pos, -$neg) diverged")
      assert(got.nonEmpty, s"vacuous fixture: ($pos, -$neg) returned nothing")
      // cross-path: the bucket-local exclusion equals the allow-predicate path
      val viaAllow = s.search(effPos, 10, allow = Some(id => !excl(id)))
        .as[(Long, Double)].collect().toSeq
      assert(got == viaAllow, s"bucket-local exclusion != allow path for ($pos, -$neg)")
    }
    // dict-absent negation reduces to plain search
    assert(s.searchNot("def val", "quantum", 10).as[(Long, Double)].collect().toSeq
      == s.search("def val", 10).as[(Long, Double)].collect().toSeq)
    // dead positive → empty
    assert(s.searchNot("quantum flux", "def", 10).count() == 0L)
  }

  // ---- boolean DSL ---------------------------------------------------------

  test("bool DSL equals the composed brute-force oracle; all three plans agree") {
    val s = buildPositional(genDocs, buckets = 5)
    val oracle = new graft.oracle.ExactScorer(genDocs.toIndexedSeq)
    def hasPhrase(text: String, p: String): Boolean = {
      val pt = Tokenizer.tokenize(p); val tk = Tokenizer.tokenize(text)
      tk.indices.exists(i => i + pt.length <= tk.length &&
        pt.indices.forall(j => tk(i + j) == pt(j)))
    }
    def brute(m: String, sh: String, n: String, p: String): Seq[(Long, Double)] = {
      val negTs = Tokenizer.tokenize(n).distinct
      val mustTs = Tokenizer.tokenize(m).distinct
      val phraseTs = Tokenizer.tokenize(p)
      if (mustTs.exists(negTs.contains) || phraseTs.exists(negTs.contains))
        return Seq.empty
      val scoring = (mustTs ++ Tokenizer.tokenize(sh).distinct ++ phraseTs)
        .distinct.filterNot(negTs.contains)
      val eligible = genDocs.filter { case (_, text) =>
        val tk = Tokenizer.tokenize(text).toSet
        mustTs.forall(tk) && (phraseTs.isEmpty || hasPhrase(text, p)) &&
          !negTs.exists(tk)
      }.map(_._1).toSet
      oracle.search(scoring.mkString(" "), genDocs.size)
        .filter(h => eligible(h._1)).take(10).toSeq
    }
    for ((m, sh, n, p) <- Seq(
        ("def class", "import return", "", ""),      // MUST+SHOULD (postings plan)
        ("import", "val lambda", "struct", ""),      // MUST+SHOULD+NOT
        ("", "static void", "include", "def class"), // SHOULD+NOT+PHRASE (positions plan)
        ("return", "class val", "", "import return"))) { // MUST+SHOULD+PHRASE
      val got = s.searchBool(10, must = m, should = sh, mustNot = n, phrase = p)
        .as[(Long, Double)].collect().toSeq
      val want = brute(m, sh, n, p)
      assert(want.nonEmpty, s"vacuous bool fixture ($m | $sh | -$n | \"$p\")")
      assert(got == want, s"bool($m | $sh | -$n | \"$p\") diverged")
    }
    // MUST-only bool == conjunctive search (same fold, same gate)
    val boolOnly = s.searchBool(10, must = "class import return")
      .as[(Long, Double)].collect().toSeq
    val conj = s.searchConjunctiveMany(Seq((0, "class import return")), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
    assert(boolOnly.nonEmpty && boolOnly == conj, "bool MUST-only != conjunctive")
    // gate-free bool delegates to AND-NOT disjunctive search
    assert(s.searchBool(10, should = "def val", mustNot = "lambda")
      .as[(Long, Double)].collect().toSeq
      == s.searchNot("def val", "lambda", 10).as[(Long, Double)].collect().toSeq)
    // unsatisfiable canaries die at planning
    assert(s.searchBool(10, must = "def", mustNot = "def").count() == 0L)
    assert(s.searchBool(10, should = "val", phrase = "def class",
      mustNot = "class").count() == 0L)
    // dict-absent MUST / phrase term → dead
    assert(s.searchBool(10, must = "quantum", should = "def").count() == 0L)
    assert(s.searchBool(10, should = "def", phrase = "quantum flux").count() == 0L)
  }
}
