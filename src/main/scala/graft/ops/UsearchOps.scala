package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational renderings of the reference's key-level API surface
  * (SURVEY.md §2.1/§2.2): contains/count/get/export_keys/stats and the
  * remove/rename mutations (tombstone + remap — the Spark-native shape of
  * /root/reference/include/usearch/index_dense.hpp:1479-1587).
  */
object UsearchOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `contains(key)` analog: keys that exist in a second collection —
    * LEFT SEMI join (never materializes the probe side's payload).
    */
  def contains(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .join(t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))

  val containsSql: String =
    """SELECT p_partkey FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin

  /** `count(key)` analog (multi-index multiplicity): occurrences per key. */
  def countKey(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_partkey"))

  val countKeySql: String =
    "SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey ORDER BY l_partkey"

  /** `get(key)` analog: point lookups by key (pushed to the Parquet scan). */
  def get(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .where(col("doc_id").isin(1L, 5L, 10L, 99L))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  val getSql: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id IN (1, 5, 10, 99) ORDER BY doc_id""".stripMargin

  /** `export_keys(buf, offset, limit)` analog: paginated ordered key scan. */
  def exportKeys(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
      .offset(10)
      .limit(20)

  val exportKeysSql: String =
    "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20 OFFSET 10"

  /** `stats()` analog: grouped size/footprint metrics. */
  def stats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double")).as("avg_chars"))
      .orderBy(col("lang"))

  val statsSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** `remove(keys)` analog: tombstone set + LEFT ANTI join at read time
    * (physical delete deferred to segment merge). Tombstones here: every
    * 'zh' doc — derived from data so the anti-join is real.
    */
  def removeTombstones(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tombstones = docs.where(col("lang") === "zh").select(col("doc_id"))
    docs.join(tombstones, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  val removeTombstonesSql: String =
    """SELECT lang, count(*) AS n_docs FROM documents d
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM documents z WHERE z.lang = 'zh' AND z.doc_id = d.doc_id)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** `rename(from, to)` analog: re-key members via a mapping join; vectors
    * (payload columns) untouched.
    */
  def rename(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val mapping = docs.where(col("doc_id") < 20)
      .select(col("doc_id"), (col("doc_id") + 1000000L).as("new_id"))
    docs.join(mapping, Seq("doc_id"), "inner")
      .select(col("new_id").as("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val renameSql: String =
    """SELECT doc_id + 1000000 AS doc_id, lang, n_chars FROM documents
      |WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
}
