package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Distances, Quantize}

/** Driver-oracled query entries for the rest of the reference's metric
  * surface — inner-product and l2sq rankings, Pearson, Jensen-Shannon,
  * haversine, and the packed-bitset Tanimoto/Sørensen forms
  * (/root/reference/include/usearch/index_plugins.hpp:1309-1657; SQL
  * scalar surface /root/reference/sqlite/lib.cpp:209-335). The Column
  * implementations live in [[graft.functions.Distances]]; this file
  * pairs each with a fixture query over `embeddings` plus its DuckDB
  * twin, following the repo float rules: exact-integer ratios are
  * emitted raw (a single correctly-rounded IEEE division is
  * cross-engine identical), float expressions mirror the exact
  * operation order and round to 6 dp, anything that can cancel to a
  * tiny negative gets `round + 0.0`.
  */
object MetricQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Consecutive-id pairs (even left_id < 40) — the same fixture shape
    * as `Similarity.pairwiseDistance`.
    */
  private def pairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val left = e.where(col("vec_id") < 40 && col("vec_id") % 2 === 0)
      .select(col("vec_id").as("left_id"), col("embedding").as("a"))
    val right = e.select(col("vec_id").as("right_id"), col("embedding").as("b"))
    left.join(right, col("right_id") === col("left_id") + 1)
  }

  private val pairsSqlFrom =
    "FROM embeddings l JOIN embeddings r ON r.vec_id = l.vec_id + 1 " +
      "WHERE l.vec_id < 40 AND l.vec_id % 2 = 0"

  // ---------------------------------------------------------------- ip

  /** Top-k by inner-product distance 1 − ⟨a,b⟩ (`metric_ip_gt`,
    * index_plugins.hpp:1309-1326) — ascending distance, id tie-break.
    * Unnormalized vectors make negative distances legitimate; the near-
    * zero self-distance motivates the `round + 0.0` rule.
    */
  def knnIp(spark: SparkSession, dir: String, k: Int = 10,
      queryVecId: Long = 0L): DataFrame = {
    val e = emb(spark, dir)
    val q = broadcast(e.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe")))
    e.crossJoin(q)
      .select(col("vec_id"),
        (lit(1.0) - Similarity.dot(col("embedding"), col("qe"))).as("raw"))
      .orderBy(asc("raw"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), (round(col("raw"), 6) + lit(0.0)).as("ip_dist"))
  }

  def knnIpSql(k: Int = 10, queryVecId: Long = 0L): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryVecId)
       |SELECT vec_id,
       |  round(1.0 - list_dot_product(embedding::DOUBLE[], qe::DOUBLE[]), 6) + 0.0 AS ip_dist
       |FROM embeddings, q
       |ORDER BY 1.0 - list_dot_product(embedding::DOUBLE[], qe::DOUBLE[]), vec_id
       |LIMIT $k""".stripMargin

  // -------------------------------------------------------------- l2sq

  /** Top-k by squared Euclidean distance (`metric_l2sq_gt`,
    * index_plugins.hpp:1365-1385), via the three-dot-products identity —
    * which can cancel to a tiny negative on near-identical vectors,
    * hence `round + 0.0` (the CLAUDE.md l2sq rule).
    */
  def knnL2sq(spark: SparkSession, dir: String, k: Int = 10,
      queryVecId: Long = 0L): DataFrame = {
    val e = emb(spark, dir)
    val q = broadcast(e.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe")))
    e.crossJoin(q)
      .select(col("vec_id"),
        Distances.l2sqDistance(col("embedding"), col("qe")).as("raw"))
      .orderBy(asc("raw"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), (round(col("raw"), 6) + lit(0.0)).as("l2sq_dist"))
  }

  def knnL2sqSql(k: Int = 10, queryVecId: Long = 0L): String = {
    val raw = "list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) " +
      "- 2.0 * list_dot_product(embedding::DOUBLE[], qe::DOUBLE[]) " +
      "+ list_dot_product(qe::DOUBLE[], qe::DOUBLE[])"
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryVecId)
       |SELECT vec_id, round($raw, 6) + 0.0 AS l2sq_dist
       |FROM embeddings, q
       |ORDER BY $raw, vec_id
       |LIMIT $k""".stripMargin
  }

  // ----------------------------------------------------------- pearson

  /** Pearson-correlation distance over consecutive pairs
    * (`metric_pearson_gt`, index_plugins.hpp:1511-1550). The SQL mirrors
    * [[Distances.pearsonDistance]]'s exact moment arithmetic (sums as
    * dot-with-ones, cov/var in the same association order).
    */
  def pearsonPairs(spark: SparkSession, dir: String): DataFrame =
    pairs(spark, dir).select(col("left_id"), col("right_id"),
      (round(Distances.pearsonDistance(col("a"), col("b")), 6) + lit(0.0))
        .as("pearson_dist"))
      .orderBy(col("left_id"))

  val pearsonPairsSql: String = {
    def dotOnes(v: String) =
      s"list_dot_product($v::DOUBLE[], list_transform($v::DOUBLE[], z -> 1.0))"
    s"""WITH m AS (
       |  SELECT l.vec_id AS left_id, r.vec_id AS right_id,
       |    CAST(len(l.embedding) AS DOUBLE) AS n,
       |    ${dotOnes("l.embedding")} AS sa, ${dotOnes("r.embedding")} AS sb,
       |    list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) AS sab,
       |    list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[]) AS saa,
       |    list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[]) AS sbb
       |  $pairsSqlFrom),
       |c AS (
       |  SELECT left_id, right_id, sab - sa * sb / n AS cov,
       |    saa - sa * sa / n AS va, sbb - sb * sb / n AS vb
       |  FROM m)
       |SELECT left_id, right_id,
       |  round(CASE WHEN va * vb <= 0 THEN 1.0
       |             ELSE 1.0 - cov / sqrt(va * vb) END, 6) + 0.0 AS pearson_dist
       |FROM c ORDER BY left_id""".stripMargin
  }

  // -------------------------------------------------- JS divergence

  /** Jensen-Shannon divergence over consecutive pairs
    * (`metric_divergence_gt`, index_plugins.hpp:1555-1578). Embeddings
    * are not probability vectors, so each side is square-normalized
    * (pᵢ = xᵢ²/Σx²) first — deterministic, nonnegative, sums to 1. The
    * norms are materialized as named columns BEFORE the lambda (the
    * Catalyst outer-expression re-evaluation trap); the SQL twin folds
    * the identical per-index terms in the same order.
    */
  def divergencePairs(spark: SparkSession, dir: String): DataFrame = {
    val p = pairs(spark, dir)
      .select(col("left_id"), col("right_id"),
        col("a").cast("array<double>").as("ad"),
        col("b").cast("array<double>").as("bd"))
      .select(col("left_id"), col("right_id"), col("ad"), col("bd"),
        Similarity.dot(col("ad"), col("ad")).as("ssa"),
        Similarity.dot(col("bd"), col("bd")).as("ssb"))
    val terms = zip_with(col("ad"), col("bd"), (x, y) => {
      val px = x * x / col("ssa")
      val py = y * y / col("ssb")
      val m = (px + py) / lit(2.0)
      val lx = when(px > 0.0 && m > 0.0, px * log(px / m)).otherwise(lit(0.0))
      val ly = when(py > 0.0 && m > 0.0, py * log(py / m)).otherwise(lit(0.0))
      lx + ly
    })
    p.select(col("left_id"), col("right_id"),
      (round(sqrt(aggregate(terms, lit(0.0), (acc, v) => acc + v) / lit(2.0)), 6)
        + lit(0.0)).as("js_div"))
      .orderBy(col("left_id"))
  }

  val divergencePairsSql: String = {
    val px = "(ad[i] * ad[i] / ssa)"
    val py = "(bd[i] * bd[i] / ssb)"
    val m = s"(($px + $py) / 2.0)"
    s"""WITH p AS (
       |  SELECT l.vec_id AS left_id, r.vec_id AS right_id,
       |    l.embedding::DOUBLE[] AS ad, r.embedding::DOUBLE[] AS bd
       |  $pairsSqlFrom),
       |s AS (
       |  SELECT left_id, right_id, ad, bd,
       |    list_dot_product(ad, ad) AS ssa, list_dot_product(bd, bd) AS ssb
       |  FROM p),
       |t AS (
       |  SELECT left_id, right_id,
       |    list_transform(range(1, len(ad) + 1), i ->
       |      (CASE WHEN $px > 0 AND $m > 0 THEN $px * ln($px / $m) ELSE 0.0 END)
       |      + (CASE WHEN $py > 0 AND $m > 0 THEN $py * ln($py / $m) ELSE 0.0 END)) AS terms
       |  FROM s)
       |SELECT left_id, right_id,
       |  round(sqrt(list_aggregate(terms, 'sum') / 2.0), 6) + 0.0 AS js_div
       |FROM t ORDER BY left_id""".stripMargin
  }

  // --------------------------------------------------------- haversine

  /** Great-circle (haversine) distance (`metric_haversine_gt`,
    * index_plugins.hpp:1636-1657) between pseudo-coordinates read from
    * the first two embedding components (radians — the values sit in
    * [−0.53, 0.46]). Squares are explicit multiplications, not pow():
    * Math.pow(x, 2) is not guaranteed bit-equal to x·x across engines.
    */
  def haversinePairs(spark: SparkSession, dir: String): DataFrame = {
    val p = pairs(spark, dir).select(col("left_id"), col("right_id"),
      element_at(col("a"), 1).cast("double").as("lat1"),
      element_at(col("a"), 2).cast("double").as("lon1"),
      element_at(col("b"), 1).cast("double").as("lat2"),
      element_at(col("b"), 2).cast("double").as("lon2"))
    p.select(col("left_id"), col("right_id"),
      (round(Distances.haversine(col("lat1"), col("lon1"), col("lat2"), col("lon2")), 6)
        + lit(0.0)).as("hav_dist"))
      .orderBy(col("left_id"))
  }

  val haversinePairsSql: String = {
    val sdlat = "sin((lat2 - lat1) / 2.0)"
    val sdlon = "sin((lon2 - lon1) / 2.0)"
    val h = s"$sdlat * $sdlat + cos(lat1) * cos(lat2) * ($sdlon * $sdlon)"
    s"""WITH p AS (
       |  SELECT l.vec_id AS left_id, r.vec_id AS right_id,
       |    CAST(l.embedding[1] AS DOUBLE) AS lat1, CAST(l.embedding[2] AS DOUBLE) AS lon1,
       |    CAST(r.embedding[1] AS DOUBLE) AS lat2, CAST(r.embedding[2] AS DOUBLE) AS lon2
       |  $pairsSqlFrom)
       |SELECT left_id, right_id,
       |  round(2.0 * asin(sqrt($h)), 6) + 0.0 AS hav_dist
       |FROM p ORDER BY left_id""".stripMargin
  }

  // --------------------------------------- packed-bitset tanimoto / sørensen

  private def wordCounts(a: Column, b: Column, op: (Column, Column) => Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(op(x, y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  private def popCount(a: Column): Column =
    aggregate(transform(a, x => bit_count(x).cast("long")), lit(0L), (acc, v) => acc + v)

  private def b1Pairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
      .select(col("vec_id"), Quantize.b1(col("embedding")).as("bv"))
    val left = e.where(col("vec_id") < 40 && col("vec_id") % 2 === 0)
      .select(col("vec_id").as("left_id"), col("bv").as("ab"))
    val right = e.select(col("vec_id").as("right_id"), col("bv").as("bb"))
    left.join(right, col("right_id") === col("left_id") + 1)
  }

  private def b1PairsSqlWith: String =
    s"""WITH qe AS (SELECT vec_id, ${Quantize.b1Sql("embedding")} AS bv FROM embeddings),
       |p AS (SELECT l.vec_id AS left_id, r.vec_id AS right_id, l.bv AS ab, r.bv AS bb
       |      FROM qe l JOIN qe r ON r.vec_id = l.vec_id + 1
       |      WHERE l.vec_id < 40 AND l.vec_id % 2 = 0)""".stripMargin

  private def wordCountsSql(a: String, b: String, op: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), w -> bit_count($a[w] $op $b[w]))) AS BIGINT)"

  private def popCountSql(a: String): String =
    s"CAST(list_sum(list_transform($a, x -> bit_count(x))) AS BIGINT)"

  /** Tanimoto distance over b1-packed sign bits (`metric_tanimoto_gt`,
    * index_plugins.hpp:1420-1446; the SQLite surface's
    * `distance_jaccard_binary`, sqlite/lib.cpp:287-289). All-integer
    * popcounts; the final ratio is ONE correctly-rounded IEEE division,
    * so the raw double is cross-engine identical — no rounding (the
    * CLAUDE.md ratio rule's exact case).
    */
  def tanimotoB1(spark: SparkSession, dir: String): DataFrame =
    b1Pairs(spark, dir)
      .select(col("left_id"), col("right_id"),
        wordCounts(col("ab"), col("bb"), _ bitwiseAND _).as("inter"),
        wordCounts(col("ab"), col("bb"), _ bitwiseOR _).as("uni"))
      .select(col("left_id"), col("right_id"), col("inter"), col("uni"),
        when(col("uni") === 0L, lit(0.0))
          .otherwise(lit(1.0) - col("inter").cast("double") / col("uni").cast("double"))
          .as("tanimoto_dist"))
      .orderBy(col("left_id"))

  val tanimotoB1Sql: String =
    s"""$b1PairsSqlWith,
       |c AS (SELECT left_id, right_id,
       |  ${wordCountsSql("ab", "bb", "&")} AS inter,
       |  ${wordCountsSql("ab", "bb", "|")} AS uni
       |  FROM p)
       |SELECT left_id, right_id, inter, uni,
       |  CASE WHEN uni = 0 THEN 0.0
       |       ELSE 1.0 - CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) END AS tanimoto_dist
       |FROM c ORDER BY left_id""".stripMargin

  /** Sørensen-Dice distance over b1-packed sign bits
    * (`metric_sorensen_gt`, index_plugins.hpp:1452-1478). Same exact-
    * integer-ratio discipline as [[tanimotoB1]].
    */
  def sorensenB1(spark: SparkSession, dir: String): DataFrame =
    b1Pairs(spark, dir)
      .select(col("left_id"), col("right_id"),
        wordCounts(col("ab"), col("bb"), _ bitwiseAND _).as("inter"),
        (popCount(col("ab")) + popCount(col("bb"))).as("total"))
      .select(col("left_id"), col("right_id"), col("inter"), col("total"),
        when(col("total") === 0L, lit(0.0))
          .otherwise(lit(1.0) - lit(2.0) * col("inter").cast("double") / col("total").cast("double"))
          .as("sorensen_dist"))
      .orderBy(col("left_id"))

  val sorensenB1Sql: String =
    s"""$b1PairsSqlWith,
       |c AS (SELECT left_id, right_id,
       |  ${wordCountsSql("ab", "bb", "&")} AS inter,
       |  ${popCountSql("ab")} + ${popCountSql("bb")} AS total
       |  FROM p)
       |SELECT left_id, right_id, inter, total,
       |  CASE WHEN total = 0 THEN 0.0
       |       ELSE 1.0 - 2.0 * CAST(inter AS DOUBLE) / CAST(total AS DOUBLE) END AS sorensen_dist
       |FROM c ORDER BY left_id""".stripMargin

  // --------------------------------------------------- geo radius search

  /** Geo radius: 2⁻⁴ radians is an exact binary fraction — both engines
    * compare the identical haversine double against the identical
    * literal. */
  final val GeoRadiusThreshold = 0.0625
  final val GeoRadiusCap = 50

  /** GEO RADIUS search ("points within r of here", the geo-distance
    * query shape next to [[haversinePairs]]'s pairwise form): every
    * point whose great-circle (haversine) distance to the probe point
    * is under the radius, nearest-first, capped. Coordinates read as
    * (lat, lon) radians from the first two embedding components, like
    * the reference's haversine metric over 2-d inputs
    * (/root/reference/include/usearch/index_plugins.hpp:1530-1558).
    *
    * Plan: one broadcast probe row, one scan computing the distance,
    * scan-level raw-double filter, bounded TakeOrderedAndProject.
    */
  def geoRadius(spark: SparkSession, dir: String,
      threshold: Double = GeoRadiusThreshold, cap: Int = GeoRadiusCap,
      queryVecId: Long = 0L): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("lat"),
      element_at(col("embedding"), 2).cast("double").as("lon"))
    val q = broadcast(e.where(col("vec_id") === queryVecId)
      .select(col("lat").as("lat0"), col("lon").as("lon0")))
    e.where(col("vec_id") =!= queryVecId).crossJoin(q)
      .select(col("vec_id"),
        Distances.haversine(col("lat"), col("lon"), col("lat0"), col("lon0")).as("hd_raw"))
      .where(col("hd_raw") < lit(threshold))
      .orderBy(asc("hd_raw"), asc("vec_id"))
      .limit(cap)
      .select(col("vec_id"), (round(col("hd_raw"), 6) + lit(0.0)).as("hav_dist"))
  }

  def geoRadiusSql(threshold: Double = GeoRadiusThreshold, cap: Int = GeoRadiusCap,
      queryVecId: Long = 0L): String = {
    // deltas as (second − first) to mirror Distances.haversine's argument
    // order exactly — sin's odd symmetry is NOT a bitwise guarantee
    val sdlat = "sin((lat0 - lat) / 2.0)"
    val sdlon = "sin((lon0 - lon) / 2.0)"
    val h = s"$sdlat * $sdlat + cos(lat) * cos(lat0) * ($sdlon * $sdlon)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS lat,
       |                  CAST(embedding[2] AS DOUBLE) AS lon FROM embeddings),
       |q AS (SELECT lat AS lat0, lon AS lon0 FROM e WHERE vec_id = $queryVecId),
       |d AS (SELECT vec_id, 2.0 * asin(sqrt($h)) AS hd_raw
       |      FROM e, q WHERE vec_id <> $queryVecId)
       |SELECT vec_id, round(hd_raw, 6) + 0.0 AS hav_dist
       |FROM d WHERE hd_raw < CAST('$threshold' AS DOUBLE)
       |ORDER BY hd_raw, vec_id
       |LIMIT $cap""".stripMargin
  }
}
