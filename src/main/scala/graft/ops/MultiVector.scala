package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-vector-per-key operators — the reference's `multi = true` mode
  * (/root/reference/include/usearch/index_dense.hpp:114-120; duplicate
  * keys tested at /root/reference/python/scripts/test_index.py:185-205)
  * and the multi-valued `distance_between`, which aggregates the
  * MIN / MEAN / MAX distance over the cross product of the two keys'
  * vectors (index_dense.hpp:803-864).
  *
  * The multi view maps two vectors onto every key (`key = vec_id div 2`)
  * — a pure derivation both engines compute identically.
  */
object MultiVector {

  private def mv(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(expr("vec_id div 2").as("key"), col("vec_id"),
        col("embedding").cast("array<double>").as("v"))

  private val mvSqlCte: String =
    "e AS (SELECT vec_id // 2 AS key, vec_id, embedding::DOUBLE[] AS v FROM embeddings)"

  /** `count(key)` under multi: vectors per key. */
  def mvCount(spark: SparkSession, dir: String): DataFrame =
    mv(spark, dir).groupBy(col("key")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("key"))

  val mvCountSql: String =
    s"""WITH $mvSqlCte
       |SELECT key, count(*) AS n_vectors FROM e GROUP BY key ORDER BY key""".stripMargin

  /** Multi-valued `distance_between` over (even key k, k+1) pairs,
    * k < 40: min/mean/max cosine distance over the 2×2 vector cross
    * product. Mean accumulates in sorted-value order (cross-engine
    * float discipline); all three rounded with the −0.0 normalization.
    */
  def mvDistance(spark: SparkSession, dir: String): DataFrame = {
    val e = mv(spark, dir)
    val a = e.where(col("key") % 2 === 0 && col("key") < 40)
      .select(col("key").as("left_key"), col("v").as("av"))
    val b = e.select(col("key").as("right_key"), col("v").as("bv"))
    a.join(b, col("right_key") === col("left_key") + 1)
      .select(col("left_key"), col("right_key"),
        (lit(1.0) - Similarity.cosine(col("av"), col("bv"))).as("d"))
      .groupBy(col("left_key"), col("right_key"))
      .agg(
        (round(min(col("d")), 6) + lit(0.0)).as("dist_min"),
        (round(
          aggregate(sort_array(collect_list(col("d"))), lit(0.0), (acc, v) => acc + v)
            / count(lit(1)).cast("double"), 6) + lit(0.0)).as("dist_mean"),
        (round(max(col("d")), 6) + lit(0.0)).as("dist_max"))
      .orderBy(col("left_key"))
  }

  val mvDistanceSql: String = {
    val cos = "list_dot_product(a.v,b.v)/(sqrt(list_dot_product(a.v,a.v))*sqrt(list_dot_product(b.v,b.v)))"
    s"""WITH $mvSqlCte,
       |p AS (SELECT a.key AS left_key, b.key AS right_key, 1.0 - $cos AS d
       |      FROM e a JOIN e b ON b.key = a.key + 1
       |      WHERE a.key % 2 = 0 AND a.key < 40)
       |SELECT left_key, right_key,
       |  round(min(d), 6) + 0.0 AS dist_min,
       |  round(list_aggregate(list(d ORDER BY d), 'sum') / count(*), 6) + 0.0 AS dist_mean,
       |  round(max(d), 6) + 0.0 AS dist_max
       |FROM p GROUP BY 1, 2 ORDER BY left_key""".stripMargin
  }

  /** Top-k KEYS under multi: each key ranked at its BEST (minimum)
    * member distance to the query — searching a `multi = true` index
    * returns a key once however many of its vectors land near the query
    * (config index_dense.hpp:115-120; non-multi paths dedup on
    * key lookups at index_dense.hpp:812,2007, multi keeps all vectors
    * under one key and search surfaces the key's best hit). `min` per
    * key is a map-side partial aggregate and the final ranking a
    * `TakeOrderedAndProject` — one scan, shuffle O(keys · partitions).
    * min over doubles is order-independent, so no accumulation-order
    * discipline is needed; −0.0 normalized as usual.
    */
  def mvKnn(spark: SparkSession, dir: String, k: Int = 10,
      queryVecId: Long = 0L): DataFrame = {
    val e = mv(spark, dir)
    val q = broadcast(e.where(col("vec_id") === queryVecId).select(col("v").as("qv")))
    e.crossJoin(q)
      .select(col("key"), (lit(1.0) - Similarity.cosine(col("v"), col("qv"))).as("d"))
      .groupBy(col("key"))
      .agg(min(col("d")).as("d_raw"))
      .orderBy(asc("d_raw"), asc("key"))
      .limit(k)
      .select(col("key"), (round(col("d_raw"), 6) + lit(0.0)).as("dist"))
  }

  def mvKnnSql(k: Int = 10, queryVecId: Long = 0L): String = {
    val cos = "list_dot_product(e.v,q.qv)/(sqrt(list_dot_product(e.v,e.v))*sqrt(list_dot_product(q.qv,q.qv)))"
    s"""WITH $mvSqlCte,
       |q AS (SELECT v AS qv FROM e WHERE vec_id = $queryVecId),
       |m AS (SELECT e.key, min(1.0 - $cos) AS d_raw FROM e, q GROUP BY e.key)
       |SELECT key, round(d_raw, 6) + 0.0 AS dist
       |FROM m ORDER BY d_raw, key LIMIT $k""".stripMargin
  }

  /** `get(key, count)` under multi: the key's vectors, stable order. */
  def mvGet(spark: SparkSession, dir: String, key: Long): DataFrame =
    mv(spark, dir).where(col("key") === key)
      .select(col("key"), col("vec_id"), col("v")).orderBy(col("vec_id"))
}
