package graft.analyze

import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic code/text tokenizer shared by every path of the engine:
  * the distributed build, the in-memory oracle, and the DuckDB oracle SQL.
  *
  * Semantics: lowercase, split on runs of characters outside [a-z0-9],
  * drop empties. Pure function of the input string — no locale, state or
  * task-order dependence, so token streams are identical at any
  * parallelism (rank-identity requirement; see reference exact-search
  * semantics /root/reference/include/usearch/index.hpp:4251-4268).
  *
  * Oracle scope note: the THREE runtime paths (builder, searcher, Scala
  * oracle) share `toLowerCase(Locale.ROOT)` and are self-consistent on
  * any input. The DuckDB SQL twin ([[duckdbTokensSql]]) matches on
  * ASCII-dominant corpora; exotic case mappings whose lowercase lands
  * INSIDE [a-z0-9] (e.g. the Kelvin sign U+212A → 'k') depend on each
  * engine's Unicode tables and are outside the cross-engine contract —
  * the engine itself remains deterministic on them.
  */
object Tokenizer {
  final val SplitRegex = "[^a-z0-9]+"

  /** Scala-side tokenize — used by the ExactScorer oracle and tests. */
  def tokenize(s: String): Array[String] = {
    if (s == null) Array.empty
    else s.toLowerCase(Locale.ROOT).split(SplitRegex).filter(_.nonEmpty)
  }

  /** Column-side tokenize (codegen'd builtins only — no UDF): the exact
    * same semantics as [[tokenize]], expressed with `split`/`filter` so it
    * stays inside whole-stage codegen.
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), SplitRegex), t => length(t) > lit(0))

  /** Equivalent DuckDB SQL fragment for oracle queries. */
  def duckdbTokensSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), '[^a-z0-9]+'), t -> len(t) > 0)"
}
