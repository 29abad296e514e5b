package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.ops.Similarity

/** Distributed semantic join — the reference's stable-marriage `join`
  * (/root/reference/include/usearch/index.hpp:4321-4543, Python
  * `Index.join` /root/reference/python/usearch/index.py:1170-1200):
  * male-optimal one-to-one matching between two vector collections,
  * preference = ascending (cosine distance, partner id), proposals capped
  * at `maxProposals` (the reference defaults to log n + threads; lefts
  * that exhaust their list stay unmatched, as in the reference).
  *
  * Spark rendering of Gale–Shapley as batch-synchronous rounds — the GS
  * matching is proposal-order independent, so batched rounds produce
  * exactly the sequential male-optimal matching (verified against the
  * in-memory oracle in SemanticJoinSpec):
  *
  *   prefs: per-left top-M candidate lists from the engine's own grouped
  *     top-k primitive ([[graft.functions.TopKAgg]]): scoring still
  *     visits every (l, r) pair (it is an EXACT search), but the bounded
  *     buffers partial-aggregate map-side, so the shuffle moves
  *     O(n·partitions·M) buffers — never the O(n²) scored rows a window
  *     over the cross join would shuffle
  *   round: every free left proposes at its list pointer; per right keep
  *     min (distance, leftId) among proposals ∪ engagements [one window];
  *     proposers advance their pointer. Stop when nobody can propose.
  */
object SemanticJoin {

  /** @param left  DataFrame(id: Long, vec: Array) "men"
    * @param right DataFrame(id: Long, vec: Array) "women"
    * @return (left_id, right_id, dist) — the male-optimal stable matching
    */
  def join(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      maxProposals: Int): DataFrame = {

    // preference lists: per-left top-M by (dist, right_id), via the
    // bounded top-k aggregate (map-side partial → O(n·M) shuffle)
    val scored = left.select(col("id").as("left_id"), col("vec").as("lv"))
      .crossJoin(right.select(col("id").as("right_id"), col("vec").as("rv")))
      .select(col("left_id"), col("right_id"),
        (lit(1.0) - Similarity.cosine(col("lv"), col("rv"))).as("dist"))
    val prefs = scored
      .groupBy(col("left_id"))
      .agg(graft.functions.TopKAgg.least(col("dist"), col("right_id"), maxProposals).as("cands"))
      .select(col("left_id"), posexplode(col("cands")).as(Seq("pos0", "c")))
      .select(col("left_id"), (col("pos0") + 1).as("pos"),
        col("c.id").as("right_id"), col("c.score").as("dist"))
      .cache()
    prefs.count()

    val emptyEngaged = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("left_id", LongType),
        StructField("right_id", LongType),
        StructField("dist", DoubleType))))

    // eager localCheckpoint per round: truncates the iterative lineage
    // (a cached-only loop accumulates a plan per round and recompute
    // cascades blow the heap)
    var engaged = emptyEngaged.localCheckpoint(true)
    // per-left pointer: next preference position to propose at
    var nextPos = left.select(col("id").as("left_id")).withColumn("pos", lit(1))
      .localCheckpoint(true)

    var done = false
    while (!done) {
      val free = nextPos.join(engaged.select(col("left_id")), Seq("left_id"), "left_anti")
      // pointer past list end → exhausted, drops out of the join
      val proposals = free.join(prefs, Seq("left_id", "pos"))
        .select(col("left_id"), col("right_id"), col("dist"))
        .localCheckpoint(true)
      if (proposals.isEmpty) {
        done = true
      } else {
        val wRight = Window.partitionBy(col("right_id")).orderBy(asc("dist"), asc("left_id"))
        val newEngaged = proposals.unionByName(engaged)
          .withColumn("rnk", row_number().over(wRight))
          .where(col("rnk") === 1)
          .drop("rnk")
          .localCheckpoint(true)

        nextPos = nextPos
          .join(proposals.select(col("left_id"), lit(1).as("proposed")).distinct(),
            Seq("left_id"), "left")
          .select(col("left_id"),
            when(col("proposed").isNotNull, col("pos") + 1).otherwise(col("pos")).as("pos"))
          .localCheckpoint(true)

        engaged = newEngaged
      }
    }
    prefs.unpersist()
    engaged.orderBy(col("left_id"))
  }
}
