package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar metric library
  * (/root/reference/include/usearch/index_plugins.hpp:1309-1657 and the
  * SQLite SQL functions /root/reference/sqlite/lib.cpp:209-335),
  * re-expressed as Spark Column functions — builtins and the native
  * [[DotProduct]] expression; no UDFs. Each is a drop-in scoring metric
  * for the similarity operators.
  */
object Distances {

  private def dot(a: Column, b: Column): Column = DotProduct.dotCol(a, b)

  /** `metric_ip_gt`: 1 − ⟨a,b⟩ (index_plugins.hpp:1309-1326). */
  def innerDistance(a: Column, b: Column): Column = lit(1.0) - dot(a, b)

  /** `metric_cos_gt`: 1 − ab/(‖a‖‖b‖), zero-vector guarded (:1334-1359). */
  def cosineDistance(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom === 0.0, lit(1.0)).otherwise(lit(1.0) - dot(a, b) / denom)
  }

  /** `metric_l2sq_gt`: squared Euclidean — no sqrt, rank-preserving
    * (:1365-1385). ‖a−b‖² = ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩ (one pass each).
    */
  def l2sqDistance(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** `metric_hamming_gt` over packed 64-bit words (:1392-1414). */
  def hammingBits(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** `metric_jaccard_gt` over sorted sets → Spark arrays (:1486-1506). */
  def jaccardDistance(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(lit(1.0) - inter / uni)
  }

  /** `metric_tanimoto_gt` (:1420-1446): 1 − popcount(a∧b)/popcount(a∨b)
    * over packed bit words (molecular-fingerprint form).
    */
  def tanimotoBits(a: Column, b: Column): Column = {
    val inter = bit_count(a.bitwiseAND(b)).cast("double")
    val uni = bit_count(a.bitwiseOR(b)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(lit(1.0) - inter / uni)
  }

  /** `metric_tanimoto_gt` over sets → Spark arrays: same intersection-
    * over-union ratio via set cardinalities (identical to Jaccard
    * distance on sets — the bitset and set forms coincide there).
    */
  def tanimotoDistance(a: Column, b: Column): Column = jaccardDistance(a, b)

  /** `metric_sorensen_gt` (:1448-1478): 1 − 2·popcount(a∧b)/(popcount(a)
    * + popcount(b)) over packed bit words.
    */
  def sorensenBits(a: Column, b: Column): Column = {
    val inter = bit_count(a.bitwiseAND(b)).cast("double")
    val total = (bit_count(a) + bit_count(b)).cast("double")
    when(total === 0.0, lit(0.0)).otherwise(lit(1.0) - lit(2.0) * inter / total)
  }

  /** `metric_sorensen_gt` over sets (:1448-1478): set-cardinality form. */
  def sorensenDistance(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val total = (size(a) + size(b)).cast("double")
    when(total === 0.0, lit(0.0)).otherwise(lit(1.0) - lit(2.0) * inter / total)
  }

  /** `metric_pearson_gt` (:1511-1550): 1 − corr; built on the same
    * moments the reference single-passes.
    */
  def pearsonDistance(a: Column, b: Column): Column = {
    val n = size(a).cast("double")
    val sa = DotProduct.dotCol(a, array_repeat(lit(1.0d), size(a)))
    val sb = DotProduct.dotCol(b, array_repeat(lit(1.0d), size(b)))
    val sab = dot(a, b)
    val saa = dot(a, a)
    val sbb = dot(b, b)
    val cov = sab - sa * sb / n
    val va = saa - sa * sa / n
    val vb = sbb - sb * sb / n
    when(va * vb <= 0.0, lit(1.0)).otherwise(lit(1.0) - cov / sqrt(va * vb))
  }

  /** `metric_divergence_gt` (:1555-1578): Jensen-Shannon divergence over
    * probability vectors (expression-tree rendering of the same loop).
    */
  def jsDivergence(a: Column, b: Column): Column = {
    val terms = zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => {
      val m = (x + y) / lit(2.0)
      val lx = when(x > 0.0 && m > 0.0, x * log(x / m)).otherwise(lit(0.0))
      val ly = when(y > 0.0 && m > 0.0, y * log(y / m)).otherwise(lit(0.0))
      lx + ly
    })
    sqrt(aggregate(terms, lit(0.0), (acc, v) => acc + v) / lit(2.0))
  }

  /** `metric_haversine_gt` (:1636-1657): great-circle distance, radians.
    * Squares are explicit multiplications, not pow(): Math.pow(x, 2) is
    * not guaranteed bit-equal to x·x, and the DuckDB oracle twin
    * (MetricQueries.haversinePairsSql) mirrors this exact op order.
    */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val sdlat = sin((lat2 - lat1) / 2.0)
    val sdlon = sin((lon2 - lon1) / 2.0)
    val h = sdlat * sdlat + cos(lat1) * cos(lat2) * (sdlon * sdlon)
    lit(2.0) * asin(sqrt(h))
  }

  /** `distance_levenshtein_bytes` (sqlite/lib.cpp:209-267): builtin. */
  def levenshteinDistance(a: Column, b: Column): Column = levenshtein(a, b)
}
