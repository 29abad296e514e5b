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

  /** IEEE-754 binary16 (f16) rounding — the reference's headline
    * half-precision dtype (`f16_t`
    * /root/reference/include/usearch/index_plugins.hpp:299-352; recall
    * table /root/reference/README.md:249-269) — expressed in PURE DOUBLE
    * ARITHMETIC so the DuckDB twin is bit-identical:
    *
    *   - normals (|x| ≥ 2⁻¹⁴): Veltkamp/Dekker split with C = 2⁴²+1 —
    *     `t = x·C; t − (t − x)` rounds x to 53−42 = 11 significand bits
    *     at x's own exponent (round-to-nearest, ties-to-even), which IS
    *     the f16 significand rounding;
    *   - subnormals (|x| < 2⁻¹⁴): `(|x| + 1.5·2²⁸) − 1.5·2²⁸` rounds the
    *     magnitude to the f16 subnormal step 2⁻²⁴ (the 1.5·2²⁸ offset
    *     keeps the sum inside the exponent-28 binade, whose ulp is 2⁻²⁴,
    *     for positive AND tiny inputs alike), then the sign is restored
    *     by a branch (not `signum` — signum(−0.0) would reintroduce
    *     −0.0);
    *   - |x| > 65504 (f16 max normal) saturates, matching the i8 clamp
    *     convention; `+ 0.0` normalizes −0.0 (repo float rule).
    *
    * Every step is a single correctly-rounded IEEE double op in a fixed
    * order, so Spark and DuckDB produce the same 64 bits; the rounded
    * values are exact halves, so downstream double dot products stay
    * cross-engine exact too. QuantizeSpec pins the trick against an
    * independent bit-level converter (Math.getExponent + rint).
    */
  def f16(v: Column): Column = transform(v.cast("array<double>"), x => f16Scalar(x))

  /** Scalar f16 rounding of one double column (see [[f16]]). */
  def f16Scalar(x: Column): Column = {
    val xc = greatest(least(x, lit(65504.0)), lit(-65504.0))
    val sub = (abs(xc) + lit(402653184.0)) - lit(402653184.0) // 1.5·2²⁸
    val t = xc * lit(4398046511105.0) // 2⁴²+1
    (when(abs(xc) < lit(6.103515625e-05), // 2⁻¹⁴
      when(xc < 0.0, -sub).otherwise(sub))
      .otherwise(t - (t - xc))) + lit(0.0)
  }

  /** DuckDB twin of [[f16]] — the same doubles in the same order. */
  def f16Sql(v: String): String = {
    val xc = "greatest(least(x, 65504.0), -65504.0)"
    val sub = s"((abs($xc) + 402653184.0) - 402653184.0)"
    val t = s"($xc * 4398046511105.0)"
    s"list_transform($v::DOUBLE[], x -> (CASE WHEN abs($xc) < 6.103515625e-05 " +
      s"THEN (CASE WHEN $xc < 0 THEN -$sub ELSE $sub END) " +
      s"ELSE ($t - ($t - $xc)) END) + 0.0)"
  }

  /** Google-brain bfloat16 rounding — the reference's bf16 dtype
    * (`bf16_bits_t` /root/reference/include/usearch/index_plugins.hpp:91-92;
    * recall/QPS table /root/reference/BENCHMARKS.md:46-49) — by the same
    * pure-double recipe as [[f16]], with bf16's parameters:
    *
    *   - 8 significand bits (7 stored + hidden) → Veltkamp constant
    *     C = 2⁴⁵+1 (53 − 45 = 8);
    *   - f32's exponent range: normals down to 2⁻¹²⁶, max normal
    *     (2 − 2⁻⁷)·2¹²⁷ = 255·2¹²⁰ (saturating clamp, exact in double);
    *   - subnormal step 2⁻¹³³ via the offset trick with 1.5·2⁻⁸¹
    *     (= 1.5·2^(−133+52), placing the sum where ulp = 2⁻¹³³).
    *
    * Same single-rounding-per-step discipline as f16, so the DuckDB twin
    * is bit-identical; bf16 values are exact doubles, so downstream
    * cosine arithmetic stays cross-engine exact. QuantizeSpec pins the
    * arithmetic against an independent exponent-extraction converter.
    */
  def bf16(v: Column): Column = transform(v.cast("array<double>"), x => bf16Scalar(x))

  /** Scalar bf16 rounding of one double column (see [[bf16]]). */
  def bf16Scalar(x: Column): Column = {
    val xc = greatest(least(x, lit(3.3895313892515355e38)), lit(-3.3895313892515355e38))
    val sub = (abs(xc) + lit(6.203854594147708e-25)) - lit(6.203854594147708e-25) // 1.5·2⁻⁸¹
    val t = xc * lit(35184372088833.0) // 2⁴⁵+1
    (when(abs(xc) < lit(1.1754943508222875e-38), // 2⁻¹²⁶
      when(xc < 0.0, -sub).otherwise(sub))
      .otherwise(t - (t - xc))) + lit(0.0)
  }

  /** DuckDB twin of [[bf16]] — the same doubles in the same order. */
  def bf16Sql(v: String): String = {
    val xc = "greatest(least(x, 3.3895313892515355e38), -3.3895313892515355e38)"
    val sub = s"((abs($xc) + 6.203854594147708e-25) - 6.203854594147708e-25)"
    val t = s"($xc * 35184372088833.0)"
    s"list_transform($v::DOUBLE[], x -> (CASE WHEN abs($xc) < 1.1754943508222875e-38 " +
      s"THEN (CASE WHEN $xc < 0 THEN -$sub ELSE $sub END) " +
      s"ELSE ($t - ($t - $xc)) END) + 0.0)"
  }

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
