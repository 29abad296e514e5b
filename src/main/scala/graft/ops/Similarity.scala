package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity operators over the `embeddings` table — the direct
  * analogs of the reference's exact-search / distance surface:
  * `search(exact=true)` (/root/reference/include/usearch/index.hpp:4251-4268),
  * `pairwise_distance` (/root/reference/python/usearch/index.py:1263-1283),
  * `cluster` (/root/reference/include/usearch/index.hpp:3092-3125).
  *
  * All dot products run in DOUBLE via `zip_with` + `aggregate` — builtin,
  * codegen'd, no UDF. Element order of the fold matches DuckDB's
  * `list_dot_product`, so cross-engine doubles agree; outputs still round
  * to 6 dp for the hash compare.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Σ aᵢ·bᵢ in double precision (inputs are float arrays) — a native
    * codegen Expression (graft.functions.DotProduct); same element order
    * as the fold/list_dot_product formulations, so bit-identical values.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotCol(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** DuckDB fragment for the same cosine. */
  def cosineSql(a: String, b: String): String =
    s"list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[])))"

  /** Exact brute-force cosine top-k for the query vector `vec_id = 0` —
    * the `search(exact=true)` analog: score every member, bounded top-k
    * (Catalyst plans orderBy+limit as TakeOrderedAndProject: per-partition
    * partial top-k + single ordered merge, the distributed `merge_into`).
    */
  def knnExact(spark: SparkSession, dir: String, k: Int = 10,
      labelFilter: Option[Int] = None): DataFrame = {
    val e = emb(spark, dir)
    val q = broadcast(e.where(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding")))
    val base = labelFilter.map(l => e.where(col("label") === l)).getOrElse(e)
    base.crossJoin(q)
      .select(col("vec_id"), cosine(col("embedding"), col("q_embedding")).as("cos_raw"))
      .orderBy(desc("cos_raw"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
  }

  def knnExactSql(k: Int = 10, labelFilter: Option[Int] = None): String = {
    val where = labelFilter.map(l => s"WHERE label = $l").getOrElse("")
    s"""WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(${cosineSql("embedding", "q_embedding")}, 6) AS cos_sim
       |FROM embeddings, q $where
       |ORDER BY ${cosineSql("embedding", "q_embedding")} DESC, vec_id
       |LIMIT $k""".stripMargin
  }

  /** Pairwise distance over aligned key arrays (`pairwise_distance`
    * analog): cosine distance between (2i, 2i+1) pairs, vec_id < 40.
    */
  def pairwiseDistance(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val left = e.where(col("vec_id") < 40 && col("vec_id") % 2 === 0)
      .select(col("vec_id").as("left_id"), col("embedding").as("a"))
    val right = e.select(col("vec_id").as("right_id"), col("embedding").as("b"))
    left.join(right, col("right_id") === col("left_id") + 1)
      .select(col("left_id"), col("right_id"),
        round(lit(1.0) - cosine(col("a"), col("b")), 6).as("cos_dist"))
      .orderBy(col("left_id"))
  }

  val pairwiseDistanceSql: String =
    s"""SELECT a.vec_id AS left_id, b.vec_id AS right_id,
       |  round(1.0 - ${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_dist
       |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
       |WHERE a.vec_id < 40 AND a.vec_id % 2 = 0
       |ORDER BY left_id""".stripMargin

  /** Assign every vector to its nearest of 10 centroids (vec_id < 10) —
    * the `cluster(queries, level)` analog: broadcast centroids, argmin by
    * (distance, centroid) for a deterministic tie-break.
    */
  def clusterAssign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val centroids = broadcast(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_embedding")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(asc("dist_raw"), asc("centroid_id"))
    e.crossJoin(centroids)
      .select(col("vec_id"), col("centroid_id"),
        (lit(1.0) - cosine(col("embedding"), col("c_embedding"))).as("dist_raw"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("dist_raw"), 6).as("dist"))
      .orderBy(col("vec_id"))
  }

  val clusterAssignSql: String =
    s"""SELECT vec_id, centroid_id, round(dist_raw, 6) AS dist FROM (
       |  SELECT e.vec_id, c.vec_id AS centroid_id,
       |    1.0 - ${cosineSql("e.embedding", "c.embedding")} AS dist_raw,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY 1.0 - ${cosineSql("e.embedding", "c.embedding")}, c.vec_id) AS rn
       |  FROM embeddings e, embeddings c WHERE c.vec_id < 10) x
       |WHERE rn = 1
       |ORDER BY vec_id""".stripMargin

  /** IVF (inverted-file) approximate nearest-neighbor — the scale path
    * for similarity search (the role HNSW plays in the reference): vectors
    * are k-means-partitioned into `nlist` cells; a query scores ONLY the
    * `nprobe` nearest cells, touching nprobe/nlist of the data. The exact
    * brute-force path ([[knnExact]]) is the recall oracle (IvfSpec).
    */
  def ivfKnn(
      spark: SparkSession,
      dir: String,
      k: Int = 10,
      nlist: Int = 16,
      nprobe: Int = 4,
      queryVecId: Long = 0L): DataFrame = {
    val pts = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val km = graft.index.KMeans.fit(spark, pts, k = nlist, iterations = 2)

    // nprobe cells nearest to the query vector (nlist rows → driver)
    val qVec = emb(spark, dir).where(col("vec_id") === queryVecId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val probed = km.centroids.collect()
      .map { r =>
        val c = r.getSeq[Double](1).toArray
        val d = 1.0 - graft.functions.DotProduct.dot(qVec, c) /
          (math.sqrt(graft.functions.DotProduct.dot(qVec, qVec)) *
            math.sqrt(graft.functions.DotProduct.dot(c, c)))
        (r.getLong(0), d)
      }
      .sortBy { case (cid, d) => (d, cid) }
      .take(nprobe)
      .map(_._1)

    val q = broadcast(emb(spark, dir).where(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding")))
    km.assignments
      .where(col("cid").isin(probed.toSeq: _*))
      .select(col("id").as("vec_id"))
      .join(emb(spark, dir), "vec_id")
      .crossJoin(q)
      .select(col("vec_id"), cosine(col("embedding"), col("q_embedding")).as("cos_raw"))
      .orderBy(desc("cos_raw"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
  }

  /** Engine k-means (kmeans analog; not SQL-expressible — rows-only
    * driver check; exact-oracle coverage lives in KMeansSpec).
    */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    val pts = emb(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    graft.index.KMeans.fit(spark, pts, k = 8, iterations = 3)
      .assignments
      .select(col("id").as("vec_id"), col("cid").as("cluster"), round(col("dist"), 6).as("dist"))
      .orderBy(col("vec_id"))
  }

  /** Engine semantic join (stable-marriage analog; not SQL-expressible —
    * rows-only driver check; exact-oracle coverage in SemanticJoinSpec).
    */
  def semanticJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val leftDf = e.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val rightDf = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    graft.index.SemanticJoin.join(spark, leftDf, rightDf, maxProposals = 8)
      .select(col("left_id"), col("right_id"), round(col("dist"), 6).as("dist"))
  }

  /** Embedding-cosine near-duplicate pairs (training-pipeline dedup):
    * all pairs with cosine ≥ 0.9, i < j. Quadratic exact baseline — the
    * scale path is LSH bucketing (see Dedup.minhashLsh for the text
    * variant of the same pattern).
    */
  def embNearDup(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    // norms precomputed once per vector (not once per pair): O(n·d) + one
    // dot per pair instead of three — same doubles, the divisor is the
    // identical product of the identical square roots
    val e = emb(spark, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val a = e.select(col("vec_id").as("left_id"), col("embedding").as("a"), col("norm").as("norm_a"))
    val b = e.select(col("vec_id").as("right_id"), col("embedding").as("b"), col("norm").as("norm_b"))
    a.join(b, col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        (dot(col("a"), col("b")) / (col("norm_a") * col("norm_b"))).as("cos_raw"))
      .where(col("cos_raw") >= threshold)
      .select(col("left_id"), col("right_id"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("left_id"), col("right_id"))
  }

  def embNearDupSql(threshold: Double = 0.9): String =
    s"""SELECT left_id, right_id, round(cos_raw, 6) AS cos_sim FROM (
       |  SELECT a.vec_id AS left_id, b.vec_id AS right_id,
       |    ${cosineSql("a.embedding", "b.embedding")} AS cos_raw
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) x
       |WHERE cos_raw >= $threshold
       |ORDER BY left_id, right_id""".stripMargin
}
