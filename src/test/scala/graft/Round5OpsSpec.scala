package graft

import org.apache.spark.sql.functions._

import graft.ops.Fulltext
import graft.query.Bm25

/** Round-5 second-wave operators: ordered spans vs their unordered and
  * phrase neighbors, index-only hit counts and field-sorted search vs
  * brute-force recomputations, dis-max scoring vs an in-test exact
  * scorer (bit-identical doubles), and the HLL cardinality sketch's
  * accuracy contract.
  */
class Round5OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tfRows: Map[(Long, String), Long] =
    Fulltext.tfTable(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("ordered span: dominated by unordered proximity, equals phrase at span == m") {
    val s = Fulltext.positionalIndexFor(spark, dir)
    val live = Fulltext.SpanOrderedQueries.filter(_._1 != 3)
    val ordered = s.spanOrderedMany(live).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val unordered = s.proximityMany(live).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(ordered.nonEmpty, "no ordered-span hits — vacuous fixture")
    // every ordered hit is an unordered hit with span ≤ the ordered span
    ordered.foreach { case (key, (span, _)) =>
      assert(unordered.contains(key), s"ordered hit $key missing from proximity")
      assert(unordered(key)._1 <= span,
        s"unordered min_span ${unordered(key)._1} > ordered $span at $key")
    }
    // order-sensitivity: the reversed probe pair (0 vs 2) differs on this
    // fixture — "spark … dup" occurs, "dup … spark" within 10 does not
    val q0 = ordered.keys.filter(_._1 == 0).map(_._2).toSet
    val q2 = ordered.keys.filter(_._1 == 2).map(_._2).toSet
    assert(q2.nonEmpty, "reversed probe found nothing")
    assert(q0 != q2, "reversed probes match the same docs — order is vacuous here")
    // a trigram's ordered span == m exactly where the verbatim phrase occurs
    val phrase = s.phraseMany(Seq((1, "key hash join"))).collect()
      .map(_.getLong(1)).toSet
    val tight = ordered.collect { case ((1, d), (span, _)) if span == 3L => d }.toSet
    assert(tight == phrase, s"span==3 docs $tight != phrase docs $phrase")
  }

  test("multi-generation ordered span == single-index ordered span") {
    val single = Fulltext.engSpanOrdered(spark, dir).collect().map(_.toSeq).toSeq
    val multi = Fulltext.engSpanOrderedMultiGen(spark, dir).collect().map(_.toSeq).toSeq
    assert(multi == single)
    assert(single.nonEmpty)
  }

  test("countMany == brute-force tokenized counts; dead canary reports zeros") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.countMany(Fulltext.CountQueries).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    val tf = tfRows
    val expected = Fulltext.CountQueries.map { case (id, q) =>
      val ts = graft.analyze.Tokenizer.tokenize(q).distinct.toSet
      // toSeq first — collecting (d, n) pairs straight off the Map would
      // re-key by d and collapse a doc's per-term tfs
      val hits = tf.toSeq.collect { case ((d, t), n) if ts(t) => (d, n) }
      (id, hits.map(_._1).toSeq.distinct.size.toLong, hits.map(_._2).sum)
    }.sortBy(_._1)
    assert(got == expected)
    assert(got.exists(r => r._2 > 0L), "all-zero counts — vacuous fixture")
    assert(got.last == ((4, 0L, 0L)), s"dead canary not zero: ${got.last}")
  }

  test("searchSortedByLen == brute-force (dl desc, doc_id asc) over matched docs") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.searchSortedByLen(Fulltext.RefQuery.mkString(" "), Fulltext.K)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val tf = tfRows
    val ts = Fulltext.RefQuery.toSet
    val dl = tf.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
    val expected = tf.keys.collect { case (d, t) if ts(t) => d }.toSeq.distinct
      .map(d => (d, dl(d)))
      .sortBy { case (d, l) => (-l, d) }
      .take(Fulltext.K)
      .zipWithIndex.map { case ((d, l), i) => (i + 1, d, l) }
    assert(got == expected)
    assert(got.nonEmpty, "no matches — vacuous fixture")
  }

  test("dis-max == in-test exact scorer, bit-identical doubles; bounded by the sum") {
    val s = Fulltext.indexFor(spark, dir)
    val terms = Fulltext.RefQuery.sorted
    val bigK = s.stats.nDocs.toInt
    val got = s.searchDisMax(terms, Fulltext.DisMaxTie, bigK).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sum = s.search(terms.mkString(" "), bigK, exact = true).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val tf = tfRows
    val df = s.termDfs(terms)
    val dl = tf.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
    val n = s.stats.nDocs
    val avgdl = s.stats.avgdl
    val expected = tf.keys.collect { case (d, t) if terms.contains(t) => d }
      .toSeq.distinct
      .map { d =>
        var acc = 0.0
        var mx = 0.0
        terms.foreach { t =>
          tf.get((d, t)).foreach { f =>
            val part = 1.0 * (Bm25.idf(df(t), n) * Bm25.tfNorm(f.toInt, dl(d), avgdl))
            acc += part
            if (part > mx) mx = part
          }
        }
        (d, mx + Fulltext.DisMaxTie * (acc - mx))
      }
      .sortBy { case (d, sc) => (-sc, d) }
    assert(got == expected, "dis-max != exact recomputation")
    // tie < 1 never exceeds the disjunctive sum (same docs are ranked)
    got.foreach { case (d, sc) =>
      assert(sc <= sum(d) + 1e-12, s"dis-max $sc > disjunctive ${sum(d)} at doc $d")
    }
  }

  test("termsEnum == brute-force dictionary browse; empty prefix canary") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.termsEnum(Fulltext.TermsEnumPrefixes, Fulltext.TermsEnumN)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val tf = tfRows
    val df = tf.keys.toSeq.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val expected = Fulltext.TermsEnumPrefixes.flatMap { case (id, p) =>
      df.keys.toSeq.filter(_.startsWith(p)).sorted.take(Fulltext.TermsEnumN)
        .map(t => (id, t, df(t)))
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
    assert(got.nonEmpty && !got.exists(_._1 == 2), "canary prefix expanded")
  }

  test("lenPercentiles == brute-force rank selection") {
    val s = Fulltext.indexFor(spark, dir)
    val got = s.lenPercentiles(Fulltext.LenPercentilesP).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val dls = tfRows.toSeq.groupBy(_._1._1).map(_._2.map(_._2).sum).toSeq.sorted
    val n = dls.size
    val expected = Fulltext.LenPercentilesP
      .map(p => (p, dls((((n - 1).toLong * p) / 100L).toInt)))
    assert(got == expected)
    assert(got.map(_._2) == got.map(_._2).sorted, "percentiles not monotone")
  }

  test("rescore: span-bearing candidates lead, then BM25 order; spans match proximity") {
    val s = Fulltext.positionalIndexFor(spark, dir)
    val got = Fulltext.engRescore(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got.nonEmpty)
    // final order is (span-or-sentinel asc, rank1 asc)
    val keys = got.map { case (_, _, span, r1) =>
      (if (span == 0L) Fulltext.RescoreNoSpan else span, r1.toLong)
    }
    assert(keys == keys.sorted, s"fusion order violated: $keys")
    // every nonzero span equals the proximity sweep's min_span
    val prox = s.proximityMany(
      Seq((0, Fulltext.RefQuery.mkString(" "), (Fulltext.RescoreNoSpan - 1L).toInt)))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    got.filter(_._3 > 0L).foreach { case (_, d, span, _) =>
      assert(prox(d) == span, s"doc $d span $span != proximity ${prox(d)}")
    }
  }

  test("phrasePrefix == brute-force next-token-prefix adjacency count") {
    val s = Fulltext.positionalIndexFor(spark, dir)
    val got = s.phrasePrefix(Fulltext.PhrasePrefixHead, Fulltext.PhrasePrefixSuffix)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), graft.analyze.Tokenizer.tokenize(r.getString(1))))
    val head = Fulltext.PhrasePrefixHead
    val pre = Fulltext.PhrasePrefixSuffix
    val expected = docs.flatMap { case (d, ts) =>
      val n = ts.indices.dropRight(1).count(i => ts(i) == head && ts(i + 1).startsWith(pre))
      if (n > 0) Some((d, n.toLong)) else None
    }.toSeq.sortBy(_._1)
    assert(got == expected)
    assert(got.nonEmpty, "phrase-prefix probe found nothing — vacuous fixture")
    // genuinely multi-expansion on this fixture: some doc matches only
    // via a non-top expansion iff total > the single-expansion count
    val single = s.phraseMany(Seq((0, s"$head batch"))).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got.exists { case (d, n) => n != single.getOrElse(d, 0L) },
      "prefix expansion added nothing over the literal phrase — weak probe")
  }

  test("multi-generation countMany == single-index countMany") {
    val single = Fulltext.engCountQuery(spark, dir).collect().map(_.toSeq).toSeq
    val multi = Fulltext.engCountMultiGen(spark, dir).collect().map(_.toSeq).toSeq
    assert(multi == single)
  }

  test("PQ ADC == l2sq to the reconstructed vector; recall gate sane") {
    import graft.ops.Similarity
    val got = Similarity.pqKnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.length == 10)
    assert(got.forall(_._2 >= 0.0), "negative ADC distance survived rounding")
    // reconstruct independently: the same deterministic fits re-run
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val h = Similarity.PqSubDim
    val fit1 = graft.index.KMeans.fit(spark,
      e.select(col("id"), slice(col("v"), 1, h).as("vec")), Similarity.PqK, Similarity.PqIters)
    val fit2 = graft.index.KMeans.fit(spark,
      e.select(col("id"), slice(col("v"), h + 1, h).as("vec")), Similarity.PqK, Similarity.PqIters)
    def codes(f: graft.index.KMeans.Result) =
      f.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cents(f: graft.index.KMeans.Result) =
      f.centroids.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val (k1, k2) = (codes(fit1), codes(fit2))
    val (c1, c2) = (cents(fit1), cents(fit2))
    val q = e.where(col("id") === 0L).collect().head.getSeq[Double](1).toArray
    got.foreach { case (id, adc) =>
      val rec = c1(k1(id)) ++ c2(k2(id))
      val l2 = q.indices.map(i => (q(i) - rec(i)) * (q(i) - rec(i))).sum
      assert(math.abs(adc - l2) <= 1e-6 * math.max(1.0, l2),
        s"ADC $adc != l2sq-to-reconstruction $l2 for vec $id")
    }
    val rec = Similarity.pqRecall(spark, dir).collect().head
    val bp = rec.getLong(1)
    assert(bp >= 1000L && bp <= 10000L, s"PQ recall_bp out of range: $bp")
    val bpRef = Similarity.pqRecallRefine(spark, dir).collect().head.getLong(1)
    assert(bpRef >= bp, s"refine worsened recall: $bpRef < $bp")
    assert(bpRef >= 5000L, s"refined PQ recall too low: $bpRef")
  }

  test("HLL cardinality sketch: deterministic and within 25% of exact") {
    val r1 = Fulltext.ftHllCard(spark, dir).collect().head
    val r2 = Fulltext.ftHllCard(spark, dir).collect().head
    assert(r1 == r2, "sketch not deterministic")
    val est = r1.getDouble(2)
    val exact = r1.getLong(3).toDouble
    assert(exact > 0)
    assert(math.abs(est - exact) / exact <= 0.25,
      s"estimate $est too far from exact $exact")
  }
}
