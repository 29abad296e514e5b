package graft

import scala.collection.mutable

import graft.index.KMeans

/** Distributed k-means vs an in-memory oracle implementing the identical
  * deterministic recipe (init by id, ties by centroid id, sorted-sum
  * means) — the analog of the reference's kmeans test
  * (/root/reference/python/scripts/test_tooling.py:157).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) { aa += a(i) * a(i); ab += a(i) * b(i); bb += b(i) * b(i); i += 1 }
    aa - 2.0 * ab + bb
  }

  private def oracle(
      pts: Seq[(Long, Array[Double])], k: Int, iters: Int): Map[Long, Long] = {
    var centroids: IndexedSeq[Array[Double]] =
      pts.sortBy(_._1).take(k).map(_._2).toIndexedSeq
    def assign(): Map[Long, Long] = pts.map { case (id, v) =>
      val best = centroids.zipWithIndex
        .map { case (c, ci) => (l2sq(v, c), ci.toLong) }
        .min
      id -> best._2
    }.toMap
    (1 to iters).foreach { _ =>
      val a = assign()
      val byC = pts.groupBy(p => a(p._1))
      centroids = centroids.zipWithIndex.map { case (old, ci) =>
        byC.get(ci.toLong) match {
          case None => old
          case Some(members) =>
            val dim = old.length
            Array.tabulate(dim) { d =>
              val xs = members.map(_._2(d)).sorted
              var s = 0.0
              xs.foreach(s += _)
              s / members.size.toDouble
            }
        }
      }
    }
    assign()
  }

  test("distributed kmeans assignments equal the deterministic oracle") {
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val local = pts.as[(Long, Array[Double])].collect().toSeq

    val result = KMeans.fit(spark, pts, k = 5, iterations = 3)
    val got = result.assignments.select($"id", $"cid").as[(Long, Long)].collect().toMap
    val want = oracle(local, 5, 3)
    assert(got.size == want.size)
    val diffs = got.keys.filter(id => got(id) != want(id)).toSeq.sorted
    assert(diffs.isEmpty, s"assignment mismatches at ids $diffs")
    assert(result.inertia > 0.0)
  }

  test("more iterations never increase inertia") {
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val i1 = KMeans.fit(spark, pts, k = 4, iterations = 1).inertia
    val i3 = KMeans.fit(spark, pts, k = 4, iterations = 3).inertia
    assert(i3 <= i1 + 1e-9)
  }

  test("computeInertia=false skips only the inertia job; results are identical") {
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    val withI = KMeans.fit(spark, pts, k = 4, iterations = 2)
    val noI = KMeans.fit(spark, pts, k = 4, iterations = 2, computeInertia = false)
    assert(noI.inertia.isNaN)
    assert(noI.iterations == withI.iterations)
    val a1 = withI.assignments.select($"id", $"cid", $"dist")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val a2 = noI.assignments.select($"id", $"cid", $"dist")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a1 == a2)
    val c1 = withI.centroids.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val c2 = noI.centroids.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(c1 == c2)
  }

  test("inertia early exit stops deterministically and matches the fixed-iteration run") {
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vec"))
    // a coarse tolerance must stop before the generous iteration budget
    val early = KMeans.fit(spark, pts, k = 4, iterations = 20, inertiaRelTol = 0.02)
    assert(early.iterations < 20,
      s"expected an early exit, ran all ${early.iterations} iterations")
    // the early-exit result IS the fixed-iteration result at the count it
    // reports — the exit only decides WHEN to stop, never the arithmetic
    val fixed = KMeans.fit(spark, pts, k = 4, iterations = early.iterations)
    assert(fixed.iterations == early.iterations)
    assert(early.inertia == fixed.inertia)
    val a1 = early.assignments.select($"id", $"cid").as[(Long, Long)].collect().toMap
    val a2 = fixed.assignments.select($"id", $"cid").as[(Long, Long)].collect().toMap
    assert(a1 == a2)
    // disabled tolerance (default) always runs the full budget
    assert(KMeans.fit(spark, pts, k = 4, iterations = 2).iterations == 2)
  }
}
