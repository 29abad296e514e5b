package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{Dedup, Similarity}

/** The bucketed near-dup paths (hyperplane-LSH embeddings, banded
  * simhash) against their exact quadratic oracles, plus plan shape: the
  * scale paths must never plan an all-pairs (cartesian / nested-loop)
  * join — candidates come only from band-bucket equijoins.
  */
class SimilaritySpec extends SparkSpec {

  private def assertNoAllPairsJoin(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"$what plans a CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$what plans a BroadcastNestedLoopJoin:\n$plan")
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"embedding near-dup: LSH == exact quadratic oracle ($dir)") {
      val exact = Similarity.embNearDupExact(spark, dir).collect().toSeq
      val lsh = Similarity.embNearDup(spark, dir).collect().toSeq
      assert(lsh.nonEmpty, "near-dup fixture produced no pairs — vacuous")
      assert(lsh == exact, s"LSH missed/added pairs: got ${lsh.size}, want ${exact.size}")
    }
  }

  test("embedding near-dup plan is band-bucketed (no all-pairs join)") {
    assertNoAllPairsJoin(
      Similarity.embNearDup(spark, "/root/testdata/sf0.001"), "embNearDup")
  }

  test("simhash near-dup: banded == all-pairs (pigeonhole exactness)") {
    val dir = "/root/testdata/sf0.001"
    val banded = Dedup.simhashHamming(spark, dir).collect().toSeq
    // reference all-pairs formulation, inline (the shape the banded join
    // replaced): every pair, filter by bit_count(xor)
    import org.apache.spark.sql.functions._
    val sh = Dedup.simhash(spark, dir)
    val a = sh.select(col("doc_id").as("left_id"), col("simhash").as("ha"))
    val b = sh.select(col("doc_id").as("right_id"), col("simhash").as("hb"))
    val allPairs = a.join(b, col("left_id") < col("right_id"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .where(col("hamming") <= 3)
      .select(col("left_id"), col("right_id"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("left_id"), col("right_id"))
      .collect().toSeq
    assert(banded == allPairs)
  }

  test("simhash near-dup plan is band-bucketed (no all-pairs join)") {
    assertNoAllPairsJoin(
      Dedup.simhashHamming(spark, "/root/testdata/sf0.001"), "simhashHamming")
  }

  test("b1 coarse + exact refine: full shortlist == exact; 8x shortlist recovers recall") {
    val dir = "/root/testdata/sf0.001"
    // factor 50 → shortlist = whole 500-vector corpus → refine must
    // reproduce the exact ranking row-for-row
    val full = Similarity.knnB1Refine(spark, dir, k = 10, factor = 50).collect().toSeq
    val exact = Similarity.knnExact(spark, dir).collect().toSeq
    assert(full == exact, "full-corpus shortlist refine != exact ranking")
    def bp(df: DataFrame): Long = df.collect().head.getLong(1)
    val bare = bp(Similarity.recallB1(spark, dir))
    val refined = bp(Similarity.recallB1Refine(spark, dir))
    assert(refined >= bare, s"refine lowered recall: $refined < $bare")
    assert(refined >= 9000,
      s"8x shortlist should recover the b1 recall cliff, got $refined bp (bare b1: $bare)")
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"near-dup groups == union-find over verified LSH pairs ($dir)") {
      val pairs = Dedup.minhashLsh(spark, dir)
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val docIds = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").collect().map(_.getLong(0))
      // union-find with min-id roots: attaching the larger root under the
      // smaller keeps every root the minimum id of its component
      val parent = scala.collection.mutable.Map(docIds.map(d => d -> d).toSeq: _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      for ((a, b) <- pairs) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = docIds.sorted.map(d => (d, find(d))).toSeq
      val got = Dedup.neardupGroups(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected)
      val sizes = got.groupBy(_._2).map(_._2.size)
      assert(sizes.exists(_ >= 3),
        "no component of size >= 3 — transitive collapse untested (vacuous fixture)")
    }

    test(s"near-dup keep-best == brute-force (quality desc, id) argmax per group ($dir)") {
      val groups = Dedup.neardupGroups(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val quality = graft.ops.TextAnalysis.quality(spark, dir).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("quality_bp"))).toMap
      val expected = groups.groupBy(_._2).toSeq.map { case (gid, members) =>
        val best = members.map(_._1)
          .minBy(id => (-quality(id), id))
        (gid, best, quality(best), members.length.toLong)
      }.sortBy(_._1)
      val got = Dedup.neardupKeepBest(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expected)
      // every doc is in exactly one group
      assert(got.map(_._4).sum == groups.length.toLong)
      // at least one multi-member group keeps a NON-min-id member on this
      // fixture, or the entry is indistinguishable from min-id selection
      val minId = groups.groupBy(_._2).map { case (g, m) => g -> m.map(_._1).min }
      assert(got.exists(t => t._4 > 1 && t._2 != minId(t._1)) ||
        got.forall(t => t._4 == 1 || quality(t._2) >= quality(minId(t._1))),
        "keep-best never diverged from min-id and quality order untested")
    }
  }

  test("dedup shrinkage == brute-force per-lang distinct-text counts") {
    // sf0.1: the smallest fixture that actually contains duplicate texts
    // (5000 docs, 4992 distinct — smaller sfs are all-unique)
    val dir = "/root/testdata/sf0.1"
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val expected = rows.groupBy(_._1).toSeq.map { case (lang, ds) =>
      val total = ds.length.toLong
      val uniq = ds.map(_._2).distinct.length.toLong
      (lang, total, uniq, (20000L * uniq + total) / (2L * total))
    }.sortBy(_._1)
    val got = Dedup.shrinkage(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.exists(t => t._3 < t._2), "no duplicate text in fixture — shrinkage untested")
  }

  test("self-recall b1: grouped argmin == per-query knnB1 rank 1") {
    // the min(struct(h, id)) partial-agg must pick exactly the row the
    // per-query (hamming asc, id asc) top-1 picks — same total order
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.selfRecallB1(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "empty sample — vacuous")
    got.foreach { case (qid, top1, hit) =>
      val expected = Similarity.knnB1(spark, dir, k = 1, queryVecId = qid)
        .collect().head.getLong(0)
      assert(top1 == expected, s"query $qid: argmin $top1 != knnB1 top-1 $expected")
      assert(hit == (if (top1 == qid) 1L else 0L))
    }
    // the fixture has no duplicate embeddings, so displacement (if any)
    // comes from genuine b1 Hamming ties — and the exact f64 path must
    // always find self (the reference's "expect the point itself")
    got.foreach { case (qid, _, _) =>
      val exactTop = Similarity.knnExact(spark, dir, k = 1, queryVecId = qid)
        .collect().head.getLong(0)
      assert(exactTop == qid, s"exact search displaced self for $qid")
    }
  }
}
