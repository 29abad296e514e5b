package graft

import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Closed-form oracle tests for the metric library — the analog of the
  * reference's test_distances.py (scipy recomputation,
  * /root/reference/python/scripts/test_distances.py:62-104).
  */
class DistancesSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)

  private val a = typedLit(Seq(1.0, 2.0, 3.0))
  private val b = typedLit(Seq(4.0, 5.0, 6.0))

  test("inner / cosine / l2sq against closed form") {
    assert(eval1(Distances.innerDistance(a, b)) == 1.0 - 32.0)
    val cos = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(eval1(Distances.cosineDistance(a, b)) - (1.0 - cos)) < 1e-12)
    assert(eval1(Distances.l2sqDistance(a, b)) == 27.0)
    // zero-vector guard
    val z = typedLit(Seq(0.0, 0.0, 0.0))
    assert(eval1(Distances.cosineDistance(a, z)) == 1.0)
  }

  test("hamming over packed bits") {
    val got = Seq((12345L, 54321L)).toDF("x", "y")
      .select(Distances.hammingBits(col("x"), col("y")).as("h")).head().getInt(0)
    assert(got == java.lang.Long.bitCount(12345L ^ 54321L))
  }

  test("jaccard / sorensen over sets") {
    val s1 = typedLit(Seq(1, 2, 3, 4))
    val s2 = typedLit(Seq(3, 4, 5))
    assert(math.abs(eval1(Distances.jaccardDistance(s1, s2)) - (1.0 - 2.0 / 5.0)) < 1e-12)
    assert(math.abs(eval1(Distances.sorensenDistance(s1, s2)) - (1.0 - 4.0 / 7.0)) < 1e-12)
    // tanimoto over sets coincides with jaccard distance
    assert(eval1(Distances.tanimotoDistance(s1, s2)) ==
      eval1(Distances.jaccardDistance(s1, s2)))
  }

  test("tanimoto / sorensen over packed bit words (fingerprint form)") {
    // a = 0b1101 (bits {0,2,3}), b = 0b0110 (bits {1,2}):
    // and = {2} (1 bit), or = {0,1,2,3} (4 bits), |a|=3, |b|=2
    val df = Seq((13L, 6L)).toDF("x", "y")
    val tan = df.select(Distances.tanimotoBits(col("x"), col("y")).as("t"))
      .head().getDouble(0)
    assert(math.abs(tan - (1.0 - 1.0 / 4.0)) < 1e-12)
    val sor = df.select(Distances.sorensenBits(col("x"), col("y")).as("s"))
      .head().getDouble(0)
    assert(math.abs(sor - (1.0 - 2.0 * 1.0 / 5.0)) < 1e-12)
    // all-zero guard
    val z = Seq((0L, 0L)).toDF("x", "y")
    assert(z.select(Distances.tanimotoBits(col("x"), col("y"))).head().getDouble(0) == 0.0)
  }

  test("pearson distance matches corr") {
    val x = Seq(1.0, 2.0, 3.0, 5.0)
    val y = Seq(2.0, 4.0, 5.0, 4.0)
    val n = 4.0
    val mx = x.sum / n
    val my = y.sum / n
    val cov = x.zip(y).map { case (p, q) => (p - mx) * (q - my) }.sum
    val vx = x.map(p => (p - mx) * (p - mx)).sum
    val vy = y.map(q => (q - my) * (q - my)).sum
    val expected = 1.0 - cov / math.sqrt(vx * vy)
    val got = eval1(Distances.pearsonDistance(typedLit(x), typedLit(y)))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("js divergence: zero for identical distributions, positive otherwise") {
    val p = typedLit(Seq(0.25, 0.25, 0.5))
    assert(eval1(Distances.jsDivergence(p, p)) == 0.0)
    val q = typedLit(Seq(0.5, 0.25, 0.25))
    assert(eval1(Distances.jsDivergence(p, q)) > 0.0)
  }

  test("haversine: quarter circle") {
    val got = eval1(Distances.haversine(lit(0.0), lit(0.0), lit(0.0), lit(math.Pi / 2)))
    assert(math.abs(got - math.Pi / 2) < 1e-12)
  }

  test("levenshtein builtin") {
    val got = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(Distances.levenshteinDistance(col("a"), col("b"))).head().getInt(0)
    assert(got == 3)
  }
}
