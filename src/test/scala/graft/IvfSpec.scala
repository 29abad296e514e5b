package graft

import graft.ops.Similarity

/** IVF ANN vs the exact brute-force oracle — the reference's recall@k
  * measurement (/root/reference/cpp/bench.cpp:401-410,
  * BatchMatches.mean_recall /root/reference/python/usearch/index.py:374-393).
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("IVF self-recall and recall@10 vs exact") {
    val exact = Similarity.knnExact(spark, dir, k = 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    val ivf = Similarity.ivfKnn(spark, dir, k = 10, nlist = 16, nprobe = 4)
      .as[(Long, Double)].collect().map(_._1)

    // the query vector's own cell is always probed → it finds itself
    assert(ivf.head == 0L, s"self not at rank 1: ${ivf.toSeq}")
    val recall = ivf.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 too low: $recall (${ivf.toSeq})")
    info(s"recall@10 = $recall with nprobe/nlist = 4/16 (scanning ~25% of vectors)")
  }

  test("nprobe = nlist degenerates to exact search") {
    val exact = Similarity.knnExact(spark, dir, k = 10)
      .as[(Long, Double)].collect().toSeq
    val ivf = Similarity.ivfKnn(spark, dir, k = 10, nlist = 8, nprobe = 8)
      .as[(Long, Double)].collect().toSeq
    assert(ivf == exact)
  }

  test("filtered IVF honors the predicate and matches filtered exact at full probe") {
    val full = Similarity.ivfKnn(spark, dir, k = 10, nlist = 8, nprobe = 8,
      labelFilter = Some(3)).as[(Long, Double)].collect().toSeq
    val exact = Similarity.knnExact(spark, dir, k = 10, labelFilter = Some(3))
      .as[(Long, Double)].collect().toSeq
    assert(full == exact)
    val allowed = spark.read.parquet(s"$dir/embeddings.parquet")
      .where($"label" === 3).select($"vec_id").as[Long].collect().toSet
    val partial = Similarity.ivfKnn(spark, dir, k = 10, nlist = 8, nprobe = 3,
      labelFilter = Some(3)).as[(Long, Double)].collect()
    assert(partial.nonEmpty)
    assert(partial.forall(r => allowed.contains(r._1)),
      s"non-label-3 ids leaked: ${partial.map(_._1).toSeq}")
  }

  test("incremental add: argmin parity and added vectors searchable exactly") {
    import graft.functions.DotProduct.{dot => ddot}
    val split = 400L
    val ivf = Similarity.ivfIndexFor(spark, dir, nlist = 8, maxId = Some(split))
    val cents = ivf.centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    // brute-force (l2sq asc, cid asc) argmin over the persisted centroids
    val expected = spark.read.parquet(s"$dir/embeddings.parquet")
      .where($"vec_id" >= split)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val best = cents.map { case (cid, c) =>
          (ddot(v, v) - 2.0 * ddot(v, c) + ddot(c, c), cid)
        }.min
        r.getLong(0) -> best._2
      }.toMap
    val got = Similarity.ivfAddAssignments(spark, dir, nlist = 8, splitId = split)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.toSet.size > 1, "all added vectors fell in one cell — vacuous")
    // base index never saw the added ids
    val baseIds = ivf.assignments.select($"id").as[Long].collect().toSet
    assert(baseIds.forall(_ < split))
    // full-probe search from the added batch reproduces brute-force exact
    val addKnn = Similarity.ivfAddKnn(spark, dir).as[(Long, Double)].collect().toSeq
    val exact = Similarity.knnExact(spark, dir, queryVecId = 450L)
      .as[(Long, Double)].collect().toSeq
    assert(addKnn == exact)
  }

  test("batched IVF equals per-query IVF at nprobe < nlist") {
    val nQ = 3
    val batch = Similarity.ivfKnnMany(spark, dir, nQueries = nQ, k = 10,
      nlist = 8, nprobe = 3)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    (0 until nQ).foreach { q =>
      val per = Similarity.ivfKnn(spark, dir, k = 10, nlist = 8, nprobe = 3,
        queryVecId = q.toLong)
        .as[(Long, Double)].collect().toSeq
      assert(batch.getOrElse(q.toLong, Seq.empty) == per, s"query $q")
    }
  }

  test("recall-vs-nprobe curve is monotone and exact at full probe") {
    val curve = Similarity.ivfRecallCurve(spark, dir)
      .as[(Int, Long)].collect().toSeq
    assert(curve.map(_._1) == Similarity.RecallCurveNprobes,
      s"nprobe points: $curve")
    val bps = curve.map(_._2)
    assert(bps.zip(bps.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: $curve")
    // nprobe = nlist probes every cell → the IVF result IS brute force
    assert(bps.last == 10000L, s"full probe must be exact: $curve")
    // the curve must do real work at the sparse end: probing 1/64 of the
    // cells can't silently scan everything
    assert(bps.head < 10000L, s"nprobe=1 suspiciously perfect: $curve")
    info(s"recall curve (bp): ${curve.map { case (p, r) => s"$p→$r" }.mkString(", ")}")
  }

  test("ivfStats occupancy sums to the corpus and matches an assignment recount") {
    val stats = Similarity.ivfStats(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(stats.map(_._2).sum == total,
      s"cell counts don't partition the corpus: $stats")
    // independent recount straight off the persisted assignments
    val recount = Similarity.ivfIndexFor(spark, dir, nlist = 8).assignments
      .groupBy("cid").count().as[(Long, Long)].collect().toMap
    stats.foreach { case (cid, n, shareBp) =>
      assert(recount.getOrElse(cid, 0L) == n, s"cell $cid: $n vs recount")
      assert(shareBp == (20000L * n + total) / (2L * total), s"cell $cid share_bp")
    }
    assert(stats.count(_._2 > 0) > 1, "degenerate clustering — one cell holds all")
  }
}
