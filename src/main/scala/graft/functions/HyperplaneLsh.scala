package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH for cosine similarity — the bucketed
  * candidate generator for embedding near-dup, playing the role the HNSW
  * graph plays for the reference's approximate search
  * (/root/reference/include/usearch/index.hpp:2-4): pairs are compared
  * only when they share a band, never all-pairs.
  *
  * Signature: `NumBands` bands of `BandBits` sign bits each; bit j of
  * band b is `sign(⟨v, plane_{b·BandBits+j}⟩)`. Planes are generated once
  * from a fixed seed on the driver and embedded as literals, so the
  * bucketing is a pure deterministic function of the data — identical
  * across runs, parallelism levels, and resumes.
  *
  * Planes are [[MaxDims]] long and the dot product runs over
  * `min(len(v), MaxDims)` elements ([[DotProduct.dot]] semantics), so one
  * plane set serves any embedding dimension ≤ MaxDims.
  */
object HyperplaneLsh {

  final val NumBands = 8
  final val BandBits = 16
  final val MaxDims = 256
  final val Seed = 0x9e3779b9L

  /** Gaussian planes, seeded — deterministic across JVMs (java.util.Random
    * algorithm is specified).
    */
  lazy val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(Seed)
    Array.fill(NumBands * BandBits)(Array.fill(MaxDims)(rnd.nextGaussian()))
  }

  /** Array of `NumBands` band values (each a BandBits-bit long) for a
    * double-array vector column. Pure builtin composition: one
    * codegen'd [[DotProduct]] per plane, bits packed with when/sum.
    */
  def bandsCol(v: Column): Column = {
    val bands = (0 until NumBands).map { b =>
      (0 until BandBits).map { j =>
        val p = planes(b * BandBits + j)
        when(DotProduct.dotCol(v, typedlit(p.toSeq)) > 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(bands: _*)
  }
}
