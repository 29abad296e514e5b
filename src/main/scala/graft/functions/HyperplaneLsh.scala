package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane (sign) LSH for cosine similarity — the bucketed
  * candidate generator for embedding near-dup, playing the role the HNSW
  * graph plays for the reference's approximate search
  * (/root/reference/include/usearch/index.hpp:2-4): pairs are compared
  * only when they share a band, never all-pairs.
  *
  * Signature: `NumBands` bands of `BandBits` sign bits each; bit j of
  * band b is `sign(⟨v, plane_{b·BandBits+j}⟩)`. Planes are generated from
  * a FIXED seed lazily in each JVM (java.util.Random's algorithm is
  * specified, so every executor derives identical planes with zero
  * serialization), making the bucketing a pure deterministic function of
  * the data — identical across runs, parallelism levels, and resumes.
  *
  * Planes are [[MaxDims]] long and the dot runs over
  * `min(len(v), MaxDims)` elements, so one plane set serves any
  * embedding dimension ≤ MaxDims.
  */
object HyperplaneLsh {

  final val NumBands = 8
  final val BandBits = 16
  final val MaxDims = 256
  final val Seed = 0x9e3779b9L

  lazy val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(Seed)
    Array.fill(NumBands * BandBits)(Array.fill(MaxDims)(rnd.nextGaussian()))
  }

  /** Band values for one vector: NumBands longs of BandBits sign bits. */
  def bandsOf(v: Array[Double]): Array[Long] = {
    val out = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var acc = 0L
      var j = 0
      while (j < BandBits) {
        val p = planes(b * BandBits + j)
        var d = 0.0
        var i = 0
        val n = math.min(v.length, MaxDims)
        while (i < n) { d += v(i) * p(i); i += 1 }
        if (d > 0.0) acc |= (1L << j)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** Column form: one compact native expression (the 128 plane dots live
    * in a tight loop, not in 128 Catalyst nodes — the expression-tree
    * version bloated every task binary past 2 MiB and fell out of
    * whole-stage codegen).
    */
  def bandsCol(v: Column): Column =
    Bridge.column(HyperplaneBands(Bridge.expression(v.cast("array<double>"))))
}

/** `array<double>` → `array<long>` band signature (see [[HyperplaneLsh]]).
  * CodegenFallback: the interpreted path is already one tight primitive
  * loop per row; nothing for codegen to fuse.
  */
case class HyperplaneBands(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(HyperplaneLsh.bandsOf(v))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
