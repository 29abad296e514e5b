package graft

import org.apache.spark.sql.functions._

import graft.index.SemanticJoin
import graft.oracle.StableMarriage

/** Distributed stable-marriage join vs the sequential Gale–Shapley oracle
  * (the reference's join demo analog, /root/reference/python/scripts/join.py).
  */
class SemanticJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def vectors(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])]
      .collect()
      .toMap

  private def cosineDist(a: Array[Double], b: Array[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
    1.0 - ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  test("distributed GS matches the sequential male-optimal oracle") {
    val vecs = vectors()
    val leftIds = vecs.keys.filter(_ < 20).toSeq.sorted
    val rightIds = vecs.keys.filter(id => id >= 20 && id < 45).toSeq.sorted
    val maxProposals = 6

    val expected = StableMarriage.solve(
      leftIds, rightIds, (l, r) => cosineDist(vecs(l), vecs(r)), maxProposals)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val leftDf = e.where($"vec_id" < 20).select($"vec_id".as("id"), $"embedding".as("vec"))
    val rightDf = e.where($"vec_id" >= 20 && $"vec_id" < 45)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val got = SemanticJoin.join(spark, leftDf, rightDf, maxProposals)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)

    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)),
      s"pairs differ:\n got=$got\n want=$expected")
    // one-to-one
    assert(got.map(_._1).distinct.size == got.size)
    assert(got.map(_._2).distinct.size == got.size)
    // stability: no blocking pair among the matched sets
    val matchOfLeft = got.map(t => t._1 -> (t._2, t._3)).toMap
    val matchOfRight = got.map(t => t._2 -> (t._1, t._3)).toMap
    for (l <- matchOfLeft.keys; r <- matchOfRight.keys) {
      val d = cosineDist(vecs(l), vecs(r))
      val dl = matchOfLeft(l)._2
      val dr = matchOfRight(r)._2
      // l and r both strictly prefer each other → blocking pair
      assert(!(d < dl && d < dr), s"blocking pair ($l, $r)")
    }
  }

  test("unbalanced sides: extra lefts stay unmatched after exhausting proposals") {
    val vecs = vectors()
    val leftIds = vecs.keys.filter(_ < 15).toSeq.sorted
    val rightIds = vecs.keys.filter(id => id >= 15 && id < 20).toSeq.sorted // only 5 rights
    val expected = StableMarriage.solve(
      leftIds, rightIds, (l, r) => cosineDist(vecs(l), vecs(r)), 3)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val leftDf = e.where($"vec_id" < 15).select($"vec_id".as("id"), $"embedding".as("vec"))
    val rightDf = e.where($"vec_id" >= 15 && $"vec_id" < 20)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val got = SemanticJoin.join(spark, leftDf, rightDf, 3)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    assert(got.size <= 5)
  }
}
