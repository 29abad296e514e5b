package graft.index

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.ops.Similarity

/** Distributed k-means — the reference's standalone `kmeans` clustering
  * (/root/reference/include/usearch/index_plugins.hpp:2166-2410, Python
  * /root/reference/python/usearch/index.py:1618-1710), Spark-first:
  * broadcast centroids, argmin assignment via a min-struct aggregation, update
  * via posexplode + per-dimension aggregation.
  *
  * Determinism discipline (matches the engine's rank-identity rules):
  * init = first k points by id (k rows collected to the driver — no
  * global single-partition window); assignment ties broken by centroid
  * id; centroid sums accumulate in a data-defined order independent of
  * parallelism, via a TWO-LEVEL sorted-segment sum:
  *
  *   level 1: within each fixed id-range segment (`id div rangeSize`),
  *            sum the dimension's values in ascending value order;
  *   level 2: sum the segment sums in ascending segment order.
  *
  * Every materialized list is bounded — `rangeSize` values at level 1,
  * `n / rangeSize` partial sums at level 2 — unlike a single
  * collect_list of a whole cluster's values, which is one unbounded row
  * per (cid, dim) and OOMs at scale. At the default rangeSize (2²⁰) both
  * levels stay ≤ 8 MB per row up to ~10¹² docs. Test scales have a
  * single segment, where the order degenerates to the plain sorted sum
  * (the KMeansSpec oracle recipe).
  */
object KMeans {

  /** `iterations` = centroid updates actually applied — with an inertia
    * early exit this can be fewer than the requested maximum, and
    * `fit(maxIter, tol)` ≡ `fit(iterations, tol = 0)` exactly
    * (KMeansSpec pins it).
    */
  final case class Result(
      centroids: DataFrame, assignments: DataFrame, inertia: Double, iterations: Int)

  final val DefaultRangeSize: Long = 1L << 20

  /** @param points DataFrame(id: Long, vec: Array[Float|Double])
    * @param inertiaRelTol deterministic early exit — the reference's
    *   `kmeans` stops on max_iterations OR an inertia threshold
    *   (/root/reference/include/usearch/index_plugins.hpp:2166-2410,
    *   config at :2179-2190); here: stop before an update when the
    *   previous update improved inertia by ≤ `inertiaRelTol · previous`.
    *   0.0 (default) disables the check and its extra per-iteration
    *   aggregation job. Driver-side double comparisons only → the
    *   stopping iteration is a pure function of the data, so the
    *   unrolled-CTE oracle stays valid via the reported iteration count.
    *   The reference's remaining exit — `max_seconds` wall-clock
    *   (index_plugins.hpp:2179-2190) — is deliberately NOT implemented:
    *   a wall-clock stop makes the result a function of machine speed,
    *   which this engine's rank/value-identity contract (every operator
    *   a pure function of the data) forbids. Callers wanting a time
    *   bound should bound `iterations` instead.
    */
  /** @param computeInertia when false, skip the final inertia
    *   aggregation job and report `Double.NaN` — centroids, assignments
    *   and the iteration count are bit-identical either way (the inertia
    *   pass only READS the final assignment). Callers that discard
    *   inertia (the IVF/PQ/semantic-join index builds, the kmeans bench
    *   entry) save one job plus one forced cache materialization; their
    *   first consumer of `assignments` computes the same single
    *   assignment pass the inertia job would have run.
    */
  def fit(
      spark: SparkSession,
      points: DataFrame,
      k: Int,
      iterations: Int,
      rangeSize: Long = DefaultRangeSize,
      inertiaRelTol: Double = 0.0,
      computeInertia: Boolean = true): Result = {
    val pts = points
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
      .cache()
    // no separate materialization count: the init collect below is the
    // first action and populates the cache in the same single pass

    // deterministic init: the k lowest-id points, ranked on the DRIVER
    // (≤ k rows) — a partition-less Window here would funnel the init
    // scan through a single task
    val initRows = pts.orderBy(col("id")).limit(k).collect()
      .sortBy(_.getLong(0))
    val centroidSchema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("cvec", ArrayType(DoubleType), nullable = false)))
    def mkCentroids(rows: Seq[Row]): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), centroidSchema)
    // centroid state lives on the DRIVER between iterations (k rows — the
    // same bounded-driver-state pattern as BatchCluster): each round
    // collects the ≤ k updated means and rebuilds the broadcast-side
    // frame locally, instead of caching + counting a distributed
    // centroids frame per iteration (one fewer job and no cache churn
    // per round; the collected doubles are the identical shuffle output,
    // so every value is bit-unchanged)
    var cent: Seq[(Long, Seq[Double])] =
      initRows.zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
    def centroidsDf(): DataFrame =
      mkCentroids(cent.map { case (cid, v) => Row(cid, v) })

    // argmin via min(struct(dist, cid)): the struct's lexicographic order
    // IS the (dist asc, cid asc) tie rule, and the aggregate partial-
    // combines map-side — the shuffle carries one row per point, where a
    // row_number window would shuffle and sort the full point×centroid
    // cross product. `first(vec)` is safe: vec is functionally dependent
    // on the grouping key.
    def assign(cs: DataFrame): DataFrame = pts
      .crossJoin(broadcast(cs))
      .select(col("id"), col("vec"),
        struct(
          Similarity.dot(col("vec"), col("vec")).minus(
            lit(2.0) * Similarity.dot(col("vec"), col("cvec"))).plus(
            Similarity.dot(col("cvec"), col("cvec"))).as("dist"),
          col("cid").as("cid")).as("dc"))
      .groupBy(col("id"))
      .agg(min(col("dc")).as("m"), first(col("vec")).as("vec"))
      .select(col("id"), col("m.cid").as("cid"), col("vec"), col("m.dist").as("dist"))

    var it = 0
    var prevInertia = Double.NaN
    var stop = false
    while (it < iterations && !stop) {
      val assigned0 = assign(centroidsDf())
      val assigned = if (inertiaRelTol > 0.0) assigned0.cache() else assigned0
      if (inertiaRelTol > 0.0) {
        // inertia of the CURRENT centroids' assignment: if the last
        // update bought less than the tolerance, skip further updates
        val inertia = assigned.agg(sum(col("dist"))).head().getDouble(0)
        if (!java.lang.Double.isNaN(prevInertia) &&
            prevInertia - inertia <= inertiaRelTol * prevInertia) stop = true
        prevInertia = inertia
      }
      if (stop) {
        assigned.unpersist()
      } else {
      it += 1
      // two-level deterministic mean (see scaladoc): segment sums in
      // value order, then segment order — all rows bounded
      val updated = assigned
        .select(col("cid"), expr(s"id div ${rangeSize}L").as("rng"),
          posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"), col("rng"))
        .agg(
          aggregate(sort_array(collect_list(col("x"))), lit(0.0), (a, v) => a + v).as("rsum"),
          count(lit(1)).as("rn"))
        .groupBy(col("cid"), col("dim"))
        .agg(
          aggregate(
            expr("transform(array_sort(collect_list(struct(rng, rsum))), p -> p.rsum)"),
            lit(0.0), (a, v) => a + v).as("s"),
          sum(col("rn")).as("n"))
        .withColumn("mean", col("s") / col("n").cast("double"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mean")))).as("dm"))
        .select(col("cid"), expr("transform(dm, p -> p.mean)").as("newvec"))
        .collect()
      val updMap = updated
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      // empty clusters keep their previous centroid (oracle semantics)
      cent = cent.map { case (cid, v) => (cid, updMap.getOrElse(cid, v)) }
      if (inertiaRelTol > 0.0) assigned.unpersist()
      }
    }

    val centroids = centroidsDf().cache()
    val finalAssign = assign(centroids).select(col("id"), col("cid"), col("dist")).cache()
    val inertia =
      if (computeInertia) finalAssign.agg(sum(col("dist"))).head().getDouble(0)
      else Double.NaN
    // with inertia, finalAssign is materialized by that pass — the input
    // cache (the big one: every vector) can go; without it, the caller's
    // first action recomputes the one assignment pass from the source
    pts.unpersist()
    Result(centroids, finalAssign, inertia, it)
  }
}
