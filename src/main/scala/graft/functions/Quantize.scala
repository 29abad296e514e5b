package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Vector quantization — the reference's scalar down-casts
  * (`cast_to_i8_gt` /root/reference/include/usearch/index_plugins.hpp:1170-1191,
  * `cast_to_b1x8_gt` :1137-1146; headline recall table
  * /root/reference/README.md:249-269):
  *
  *   i8: x → trunc(clamp(x·127/‖v‖₂, −127, 127)) — valid for cosine-like
  *       metrics only (the reference says the same, README.md:266).
  *       Stored as array<long>; scoring stays EXACT cross-engine because
  *       the int dot products (≤ 127²·dim) are exactly representable.
  *   b1: sign bits packed into 64-bit words (bit i of word w =
  *       v[64w+i] > 0), searched with hamming.
  *
  * Both are native imperative expressions ([[QuantizeI8]]/[[QuantizeB1]]):
  * the earlier transform-lambda formulation referenced the norm (a full
  * dot-product expression) INSIDE the lambda, which Catalyst re-evaluates
  * per element — O(dim²) per row, the same regression class as the
  * shingle-expression inlining (CLAUDE.md invariant). The native loop is
  * one O(dim) pass per row.
  */
object Quantize {

  /** i8 quantization; zero vectors map to zero (guarded division). */
  def i8(v: Column): Column =
    Bridge.column(QuantizeI8(Bridge.expression(v.cast("array<double>"))))

  /** DuckDB twin of [[i8]] (trunc matches Spark's toward-zero cast —
    * a bare DuckDB CAST would ROUND).
    */
  def i8Sql(v: String): String = {
    val mag = s"sqrt(list_dot_product($v::DOUBLE[], $v::DOUBLE[]))"
    s"list_transform($v::DOUBLE[], x -> CASE WHEN $mag = 0 THEN 0 " +
      s"ELSE CAST(trunc(greatest(least(x * 127.0 / $mag, 127.0), -127.0)) AS BIGINT) END)"
  }

  /** Dequantize i8 back to the unit sphere (`cast_from_i8_gt`: /127). */
  def fromI8(q: Column): Column =
    transform(q, x => x.cast("double") / lit(127.0))

  /** b1 binary quantization: sign bits packed into ⌈dim/64⌉ longs
    * (bit i of word w set iff v[64w+i] > 0; `1L << 63` is Long.MinValue,
    * i.e. the sign bit lands in two's complement exactly as the
    * sum-of-powers formulation did).
    */
  def b1(v: Column): Column =
    Bridge.column(QuantizeB1(Bridge.expression(v.cast("array<double>"))))

  /** DuckDB twin of [[b1]]: identical packing via integer arithmetic —
    * bit sums accumulate in HUGEINT (bit 63 enters as Long.MinValue) and
    * cast back to BIGINT, so every word is bit-identical to Spark's.
    */
  def b1Sql(v: String): String =
    s"list_transform(range(0, CAST(ceil(len($v::DOUBLE[]) / 64.0) AS INT)), w -> " +
      s"CAST(list_sum(list_transform(range(0, 64), i -> " +
      s"CASE WHEN 64*w + i + 1 <= len($v::DOUBLE[]) AND ($v::DOUBLE[])[64*w + i + 1] > 0 " +
      s"THEN CASE WHEN i = 63 THEN CAST(-9223372036854775807 - 1 AS HUGEINT) " +
      s"ELSE CAST(CAST(pow(2, i) AS BIGINT) AS HUGEINT) END " +
      s"ELSE CAST(0 AS HUGEINT) END)) AS BIGINT))"
}

/** `array<double>` → `array<long>` i8 quantization (see [[Quantize.i8]]).
  * One pass computes the norm, a second clamps/truncates — O(dim) total.
  * Arithmetic matches the SQL twin exactly: (x·127.0)/mag in that
  * association order, clamp to [−127, 127], truncate toward zero.
  * Assumes NaN-free input (embedding columns).
  */
case class QuantizeI8(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val mag = math.sqrt(ss)
    val out = new Array[Long](v.length)
    if (mag != 0.0) {
      i = 0
      while (i < v.length) {
        val d = v(i) * 127.0 / mag
        out(i) = math.max(math.min(d, 127.0), -127.0).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<double>` → `array<long>` packed sign bits (see [[Quantize.b1]]). */
case class QuantizeB1(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val out = new Array[Long]((v.length + 63) / 64)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0.0) out(i / 64) |= (1L << (i % 64))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
