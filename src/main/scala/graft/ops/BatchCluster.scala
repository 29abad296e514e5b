package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch clustering with merge-smallest refinement — the reference's
  * `cluster(queries…, min/max_clusters)` batch API
  * (/root/reference/include/usearch/index_dense.hpp:1819-1985, Python
  * `Index.cluster` /root/reference/python/usearch/index.py:1202-1261):
  *
  *   1. pick a centroid LEVEL: the reference walks HNSW layers top-down
  *      until a layer holds ≥ min_clusters nodes; the Spark rendering's
  *      level-L centroid set is the deterministic subsample
  *      `vec_id % 2^L == 0` (the same expected halving per layer),
  *      refined level-by-level while unique clusters < min_clusters;
  *   2. assign every query to its nearest centroid (argmin over
  *      (cosine distance, centroid id) — broadcast + min-struct aggregation);
  *   3. while clusters > max_clusters: merge the LEAST popular cluster
  *      into its nearest other cluster (popularity accumulates) — run on
  *      the DRIVER over the collected (centroid, popularity) table,
  *      exactly as the reference merges in-memory: the table is bounded
  *      by the centroid-set size, never by the corpus;
  *   4. resolve merge chains and recompute each query's distance to its
  *      final centroid (the reference re-traces `merged_into` and calls
  *      `distance_between`, index_dense.hpp:1952-1975).
  *
  * Deterministic tie rules (the reference's std::sort is unstable there):
  * merge source = min (popularity asc, centroid asc); merge target =
  * min (distance asc, popularity desc, centroid asc). The identical
  * rules run in the DuckDB oracle's recursive CTE ([[clusterSql]]).
  */
object BatchCluster {

  final val DefaultMin = 2
  final val DefaultMax = 8

  /** Driver-state budget: the level walk targets ≤ this many centroids,
    * so the collected (centroid, popularity, vector) tables are O(budget)
    * REGARDLESS of corpus size — the reference's shallowest-sufficient-
    * level walk (index_dense.hpp:1831-1836) gives the same bound via its
    * HNSW layer sizes. Round 2 started at a constant level 4 (n/16
    * centroids), which grows linearly with the corpus.
    */
  final val CentroidBudget = 32L

  /** Smallest level with an expected centroid count ≤ `budget`:
    * min level ≥ 1 with n ≤ 2^level · budget (for dense 0-based ids the
    * count of multiples of 2^level in [0, n) is then ≤ budget). The SQL
    * oracle derives the identical modulus with integer arithmetic.
    */
  def autoLevel(n: Long, budget: Long = CentroidBudget): Int = {
    // n ≤ 2^l·budget ⇔ 2^l ≥ ceil(n/budget) — the division form cannot
    // overflow a long at any l (2^l·budget would, past l = 57)
    val need = (n + budget - 1) / budget
    var l = 1
    while (l < 62 && (1L << l) < need) l += 1
    l
  }

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  // argmin via min(struct(dist, centroid)) — map-side partial agg, no
  // window sort of the full cross product (same tie rule: dist, centroid)
  private def assignTo(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct((lit(1.0) - Similarity.cosine(col("v"), col("cv"))).as("d"),
          col("cid").as("centroid")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.centroid").as("centroid"))

  /** @param startLevel 0 (default) derives the level from the corpus size
    *                    ([[autoLevel]] — driver state stays O(budget));
    *                    > 0 pins it explicitly (tests, subclustering).
    * @return (vec_id, cluster, dist) — cluster = surviving centroid key,
    *         dist = round(cosine distance to it, 6), ordered by vec_id.
    */
  def cluster(
      spark: SparkSession,
      dir: String,
      minClusters: Int = DefaultMin,
      maxClusters: Int = DefaultMax,
      startLevel: Int = 0): DataFrame = {
    val e = emb(spark, dir).cache()
    def centroidsAt(level: Int): DataFrame =
      e.where(col("vec_id") % lit(1L << level) === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"))

    // level refinement: dive a layer deeper while too few unique clusters.
    // The per-level probe collects the (centroid, pop) table directly —
    // its row count IS the unique-cluster count, and the final level's
    // table seeds the merge loop below, so the former separate distinct-
    // count job per level (plus one more groupBy job after the loop) is
    // gone. Rows are bounded by the centroid count either way.
    var level = if (startLevel > 0) startLevel else autoLevel(e.count())
    def popsOf(a: DataFrame): Array[(Long, Long)] =
      a.groupBy(col("centroid")).agg(count(lit(1)).as("pop"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
    var assigned = assignTo(e, centroidsAt(level))
    var pops = popsOf(assigned)
    while (pops.length < minClusters && level > 1) {
      level -= 1
      assigned = assignTo(e, centroidsAt(level))
      pops = popsOf(assigned)
    }
    assigned = assigned.cache()

    // merge-smallest loop on the driver: rows bounded by the centroid
    // count (one long + one vector each), not the corpus
    val popByCid = scala.collection.mutable.LinkedHashMap(
      pops.sortBy(_._1): _*)
    val vecByCid: Map[Long, Array[Double]] = centroidsAt(level)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cdist(a: Array[Double], b: Array[Double]): Double = {
      val d = graft.functions.DotProduct.dot _
      1.0 - d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val mergedInto = scala.collection.mutable.Map.empty[Long, Long]
    while (popByCid.size > maxClusters) {
      val src = popByCid.minBy { case (cid, pop) => (pop, cid) }._1
      val tgt = popByCid.keys.filter(_ != src)
        .minBy(c => (cdist(vecByCid(src), vecByCid(c)), -popByCid(c), c))
      mergedInto(src) = tgt
      popByCid(tgt) += popByCid.remove(src).get
    }
    def resolve(c: Long): Long = {
      var x = c
      while (mergedInto.contains(x)) x = mergedInto(x)
      x
    }
    val resolvePairs = vecByCid.keys.toSeq.sorted.map(c => (c, resolve(c)))

    import spark.implicits._
    val resolveDf = resolvePairs.toDF("centroid", "cluster")
    val finalVecs = resolvePairs.map(_._2).distinct.sorted
      .map(c => (c, vecByCid(c).toSeq)).toDF("cluster", "final_cv")
    val out = assigned
      .join(broadcast(resolveDf), "centroid")
      .join(e, "vec_id")
      .join(broadcast(finalVecs), "cluster")
      .select(col("vec_id"), col("cluster"),
        (round(lit(1.0) - Similarity.cosine(col("v"), col("final_cv")), 6) + lit(0.0)).as("dist"))
      .orderBy(col("vec_id"))
      // materialize the result while the working caches are hot, then
      // DROP them — repeated cluster() calls (bench sweep, spec suite,
      // subcluster) must not accumulate executor storage
      .localCheckpoint(true)
    assigned.unpersist()
    e.unpersist()
    out
  }

  /** DuckDB oracle: assignment + the IDENTICAL merge-smallest recursion
    * (recursive CTE carrying (centroid, popularity, merged_into) state,
    * one round per iteration) + chain resolution (second recursive CTE)
    * + final distances. Assumes the level loop does not refine
    * (guaranteed while minClusters ≤ the level's centroid count — every
    * centroid assigns to itself).
    */
  def clusterSql(
      minClusters: Int = DefaultMin,
      maxClusters: Int = DefaultMax,
      startLevel: Int = 0): String = {
    def cos(a: String, b: String): String =
      s"list_dot_product($a,$b)/(sqrt(list_dot_product($a,$a))*sqrt(list_dot_product($b,$b)))"
    // centroid modulus: explicit level, or the SAME smallest-sufficient-
    // level rule as [[autoLevel]] in exact integer arithmetic
    val centSql =
      if (startLevel > 0)
        s"cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % ${1L << startLevel} = 0)"
      else
        s"""lvl AS (SELECT min(p) AS m FROM
           |  (SELECT CAST(pow(2, g) AS BIGINT) AS p FROM generate_series(1, 62) t(g)) pw
           |  WHERE p >= ((SELECT count(*) FROM e) + $CentroidBudget - 1) // $CentroidBudget),
           |cent AS (SELECT vec_id AS cid, v AS cv FROM e, lvl WHERE vec_id % m = 0)""".stripMargin
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$centSql,
       |asg AS (SELECT vec_id, centroid FROM (
       |  SELECT e.vec_id, c.cid AS centroid,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY 1.0 - ${cos("e.v", "c.cv")}, c.cid) AS rnk
       |  FROM e CROSS JOIN cent c) WHERE rnk = 1),
       |pop0 AS (SELECT centroid, count(*) AS pop FROM asg GROUP BY 1),
       |mg(iter, centroid, pop, merged_into) AS (
       |  SELECT 0, centroid, pop, CAST(NULL AS BIGINT) FROM pop0
       |  UNION ALL
       |  SELECT iter + 1, centroid,
       |    CASE WHEN is_tgt THEN pop + src_pop WHEN is_src THEN 0 ELSE pop END,
       |    CASE WHEN is_src THEN tgt_cid ELSE merged_into END
       |  FROM (
       |    SELECT q2.*,
       |      (alive AND centroid = src_cid) AS is_src,
       |      (alive AND centroid = tgt_cid) AS is_tgt
       |    FROM (
       |      SELECT q1.*,
       |        max(CASE WHEN alive AND centroid <> src_cid AND trank = 1 THEN centroid END) OVER () AS tgt_cid
       |      FROM (
       |        SELECT q0.*,
       |          row_number() OVER (ORDER BY CASE WHEN alive AND centroid <> src_cid THEN 0 ELSE 1 END,
       |                             1.0 - ${cos("q0.cv", "q0.src_cv")}, -pop, centroid) AS trank
       |        FROM (
       |          SELECT s.iter, s.centroid, s.pop, s.merged_into,
       |            s.merged_into IS NULL AS alive,
       |            ec.v AS cv,
       |            max(CASE WHEN s.merged_into IS NULL AND s.srank = 1 THEN s.centroid END) OVER () AS src_cid,
       |            max(CASE WHEN s.merged_into IS NULL AND s.srank = 1 THEN s.pop END) OVER () AS src_pop,
       |            max(CASE WHEN s.merged_into IS NULL AND s.srank = 1 THEN ec.v END) OVER () AS src_cv,
       |            count(*) FILTER (WHERE s.merged_into IS NULL) OVER () AS n_alive
       |          FROM (
       |            SELECT mg.*, row_number() OVER (
       |              ORDER BY CASE WHEN merged_into IS NULL THEN 0 ELSE 1 END, pop, centroid) AS srank
       |            FROM mg) s
       |          JOIN e ec ON ec.vec_id = s.centroid
       |        ) q0
       |      ) q1
       |    ) q2
       |    WHERE n_alive > $maxClusters
       |  )
       |),
       |fin AS (SELECT centroid, merged_into FROM mg WHERE iter = (SELECT max(iter) FROM mg)),
       |chain(centroid, final) AS (
       |  SELECT centroid, centroid FROM fin WHERE merged_into IS NULL
       |  UNION ALL
       |  SELECT f.centroid, c.final FROM fin f JOIN chain c ON f.merged_into = c.centroid
       |)
       |SELECT a.vec_id, ch.final AS cluster,
       |  round(1.0 - ${cos("eq.v", "ec.v")}, 6) + 0.0 AS dist
       |FROM asg a JOIN chain ch ON ch.centroid = a.centroid
       |JOIN e eq ON eq.vec_id = a.vec_id
       |JOIN e ec ON ec.vec_id = ch.final
       |ORDER BY a.vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Clustering helper views (Python `Clustering`,
  // /root/reference/python/usearch/index.py:399-450)
  // ------------------------------------------------------------------

  /** `centroids_popularity`: (cluster, popularity) from a cluster()
    * result, ordered by cluster key (np.unique semantics).
    */
  def centroidsPopularity(result: DataFrame): DataFrame =
    result.groupBy(col("cluster")).agg(count(lit(1)).as("popularity"))
      .orderBy(col("cluster"))

  /** `members_of`: the query keys mapped to `centroid`. */
  def membersOf(result: DataFrame, centroid: Long): DataFrame =
    result.where(col("cluster") === centroid).select(col("vec_id"))
      .orderBy(col("vec_id"))

  /** `subcluster`: re-cluster one cluster's members at a finer level. */
  def subcluster(
      spark: SparkSession,
      dir: String,
      result: DataFrame,
      centroid: Long,
      maxClusters: Int,
      level: Int): DataFrame = {
    val memberIds = membersOf(result, centroid)
    val e = emb(spark, dir).join(memberIds, "vec_id")
    val cents = e.where(col("vec_id") % lit(1L << level) === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val assigned = assignTo(e, cents)
    assigned.join(e, "vec_id")
      .join(broadcast(cents), col("centroid") === col("cid"))
      .select(col("vec_id"), col("centroid").as("cluster"),
        (round(lit(1.0) - Similarity.cosine(col("v"), col("cv")), 6) + lit(0.0)).as("dist"))
      .orderBy(col("vec_id"))
  }
}
