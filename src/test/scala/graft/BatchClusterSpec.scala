package graft

import graft.ops.{BatchCluster, MultiVector}

/** Batch cluster API invariants + the Clustering helper views
  * (/root/reference/python/usearch/index.py:399-450) + multi-vector get.
  */
class BatchClusterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("cluster: every query assigned, cluster count within [min, max]") {
    val res = BatchCluster.cluster(spark, dir, minClusters = 2, maxClusters = 6).cache()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(res.count() == n, "every query must be assigned")
    val k = res.select($"cluster").distinct().count()
    assert(k <= 6 && k >= 2, s"cluster count $k outside [2, 6]")
    // distances are non-negative and self-centroids map to themselves
    assert(res.where($"dist" < 0.0).count() == 0)
    val selfRows = res.where($"vec_id" === $"cluster")
    assert(selfRows.count() == k, "surviving centroids must map to themselves at dist 0")
    assert(selfRows.where($"dist" =!= 0.0).count() == 0)
  }

  test("merge-smallest honors max_clusters monotonically") {
    val k8 = BatchCluster.cluster(spark, dir, maxClusters = 8)
      .select($"cluster").distinct().count()
    val k4 = BatchCluster.cluster(spark, dir, maxClusters = 4)
      .select($"cluster").distinct().count()
    assert(k8 <= 8 && k4 <= 4)
  }

  test("auto level bounds the driver-collected centroid table by the budget") {
    // pure-function check across corpus scales: the derived level always
    // keeps the expected centroid count (n / 2^level for dense ids) at or
    // under the budget — a trillion-doc corpus collects ≤ 32 rows, where
    // the old constant level 4 collected n/16 (6×10¹⁰ rows at 10¹²)
    for (n <- Seq(10L, 500L, 5000L, 1000000L, 1000000000L, 1000000000000L)) {
      val lvl = BatchCluster.autoLevel(n)
      val expectedCentroids = (n + (1L << lvl) - 1) / (1L << lvl)
      assert(expectedCentroids <= BatchCluster.CentroidBudget,
        s"n=$n level=$lvl → $expectedCentroids centroids > budget")
      // shallowest sufficient: one level up would exceed the budget
      if (lvl > 1)
        assert(n > (1L << (lvl - 1)) * BatchCluster.CentroidBudget)
    }
    // integration: at this table's size the actual modulo-subsampled
    // centroid set (what cluster() collects) fits the budget
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val lvl = BatchCluster.autoLevel(n)
    val collected = spark.read.parquet(s"$dir/embeddings.parquet")
      .where($"vec_id" % (1L << lvl) === 0).count()
    assert(collected <= BatchCluster.CentroidBudget)
  }

  test("level refinement dives when min_clusters is not met") {
    // at level 9 (ids % 512 == 0) sf0.001 has 1 centroid (< min 4) →
    // the loop must refine to a deeper level until ≥ 4 unique clusters
    val res = BatchCluster.cluster(spark, dir,
      minClusters = 4, maxClusters = 64, startLevel = 9)
    val k = res.select($"cluster").distinct().count()
    assert(k >= 4, s"refinement failed to reach min_clusters: $k")
  }

  test("Clustering helpers: popularity sums to n; members_of consistent; subcluster") {
    val res = BatchCluster.cluster(spark, dir, maxClusters = 6).cache()
    val popularity = BatchCluster.centroidsPopularity(res)
      .as[(Long, Long)].collect()
    assert(popularity.map(_._2).sum == res.count())
    assert(popularity.map(_._1).toSeq == popularity.map(_._1).toSeq.sorted)

    val (top, _) = popularity.maxBy(_._2)
    val members = BatchCluster.membersOf(res, top).as[Long].collect()
    assert(members.length == popularity.toMap.apply(top))

    val sub = BatchCluster.subcluster(spark, dir, res, top, maxClusters = 4, level = 2)
    assert(sub.count() == members.length, "subcluster must cover all members")
  }

  test("multi-vector get returns the key's vectors in stable order") {
    val got = MultiVector.mvGet(spark, dir, 3L).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(6L, 7L)) // key 3 = vec_ids 6,7
    assert(got.forall(_.getLong(0) == 3L))
  }
}
