package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  * All builtins (transform/aggregate/sequence) — codegen'd, no UDFs.
  */
object Quantize {

  /** i8 quantization; zero vectors map to zero (guarded division). */
  def i8(v: Column): Column = {
    val vd = v.cast("array<double>")
    val mag = sqrt(DotProduct.dotCol(vd, vd))
    transform(vd, x =>
      when(mag === 0.0, lit(0L))
        .otherwise(greatest(least(x * lit(127.0) / mag, lit(127.0)), lit(-127.0))
          .cast("long")))
  }

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
    * (bit i of word w set iff v[64w+i] > 0; 2ⁱ ≤ 2⁶³ stays exact as a
    * double→long cast because only i ≤ 62 sums below can carry — bit 63
    * is added as Long.MinValue to stay in two's complement).
    */
  def b1(v: Column): Column = {
    val vd = v.cast("array<double>")
    val words = (size(vd) + lit(63)) / lit(64)
    transform(sequence(lit(0), words.cast("int") - 1), w =>
      aggregate(
        sequence(lit(0), lit(63)),
        lit(0L),
        (acc, i) => {
          val idx = w * 64 + i + 1 // element_at is 1-based
          val bitVal = when(i === 63, lit(Long.MinValue))
            .otherwise(pow(lit(2.0), i).cast("long"))
          when(idx <= size(vd) && element_at(vd, idx) > 0.0, acc + bitVal)
            .otherwise(acc)
        }))
  }
}
