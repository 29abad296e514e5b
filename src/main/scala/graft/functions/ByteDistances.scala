package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-variant string distances — the reference's SQLite surface
  * distinguishes `distance_levenshtein_bytes` / `distance_hamming_bytes`
  * from the `_unicode` forms (/root/reference/sqlite/lib.cpp:209-335):
  * the byte forms edit over the raw UTF-8 code UNITS, the unicode forms
  * over code points. Spark's builtin `levenshtein` is the unicode form
  * ([[Distances.levenshteinDistance]]); these native expressions supply
  * the byte forms. DuckDB's builtins are byte-based already
  * (levenshtein('ä','b') = 2), so the oracle twins are the plain DuckDB
  * functions — no cross-engine adapter needed.
  *
  * Both are O(len) / O(len²) per row with no allocation beyond the two
  * DP rows — embarrassingly parallel over the scan at any scale.
  */
object ByteDistances {

  /** Levenshtein over UTF-8 bytes (code units, not code points). */
  def levenshteinBytes(a: Column, b: Column): Column =
    Bridge.column(LevenshteinBytes(Bridge.expression(a), Bridge.expression(b)))

  /** Hamming over UTF-8 bytes; inputs must have equal byte length
    * (DuckDB's `hamming` contract — it errors on unequal lengths too).
    */
  def hammingBytes(a: Column, b: Column): Column =
    Bridge.column(HammingBytes(Bridge.expression(a), Bridge.expression(b)))
}

/** Two-row DP Levenshtein over the operands' UTF-8 byte sequences. */
case class LevenshteinBytes(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length == 0) return b.length
    if (b.length == 0) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Positional differing-byte count over equal-byte-length UTF-8 sequences. */
case class HammingBytes(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"hamming_bytes requires equal byte lengths (${a.length} vs ${b.length})")
    var n = 0
    var i = 0
    while (i < a.length) {
      if (a(i) != b(i)) n += 1
      i += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
