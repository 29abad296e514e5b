package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Distributed k-means — the reference's standalone `kmeans` clustering
  * (/root/reference/include/usearch/index_plugins.hpp:2166-2410, Python
  * /root/reference/python/usearch/index.py:1618-1710), Spark-first:
  * broadcast centroids, argmin assignment via one window, centroid update
  * via posexplode + per-dimension aggregation.
  *
  * Determinism discipline (matches the engine's rank-identity rules):
  * init = first k points by id; assignment ties broken by centroid id;
  * centroid update sums each dimension over SORTED member values, so the
  * double accumulation order is data-defined, not task-defined — the
  * in-memory oracle reproduces it bit-for-bit (KMeansSpec).
  */
object KMeans {

  final case class Result(centroids: DataFrame, assignments: DataFrame, inertia: Double)

  /** @param points DataFrame(id: Long, vec: Array[Float|Double]) */
  def fit(spark: SparkSession, points: DataFrame, k: Int, iterations: Int): Result = {
    val pts = points
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
      .cache()
    pts.count()

    // deterministic init: the k lowest-id points
    var centroids = pts.orderBy(col("id")).limit(k)
      .select((row_number().over(Window.orderBy(col("id"))).cast("long") - 1).as("cid"),
        col("vec").as("cvec"))
      .cache()
    centroids.count()

    val wAssign = Window.partitionBy(col("id")).orderBy(asc("dist"), asc("cid"))
    def assign(cs: DataFrame): DataFrame = pts
      .crossJoin(broadcast(cs))
      .select(col("id"), col("cid"), col("vec"),
        Similarity.dot(col("vec"), col("vec")).minus(
          lit(2.0) * Similarity.dot(col("vec"), col("cvec"))).plus(
          Similarity.dot(col("cvec"), col("cvec"))).as("dist"))
      .withColumn("rnk", row_number().over(wAssign))
      .where(col("rnk") === 1)
      .select(col("id"), col("cid"), col("vec"), col("dist"))

    var it = 0
    while (it < iterations) {
      it += 1
      val assigned = assign(centroids)
      // per-dimension mean over sorted member values (deterministic sum)
      val updated = assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sort_array(collect_list(col("x"))).as("xs"), count(lit(1)).as("n"))
        .withColumn("mean",
          aggregate(col("xs"), lit(0.0), (acc, v) => acc + v) / col("n").cast("double"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("dm"))
        .select(col("cid"), expr("transform(dm, p -> p.mean)").as("newvec"))
      // empty clusters keep their previous centroid (oracle semantics)
      val next = centroids
        .join(updated, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("newvec"), col("cvec")).as("cvec"))
        .cache()
      next.count()
      centroids.unpersist()
      centroids = next
    }

    val finalAssign = assign(centroids).select(col("id"), col("cid"), col("dist")).cache()
    val inertia = finalAssign.agg(sum(col("dist"))).head().getDouble(0)
    Result(centroids, finalAssign, inertia)
  }
}
