package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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

    // single state row per left: (pointer, engagement) — the identical
    // encoding the SQL oracle's recursive CTE carries. One eager
    // localCheckpoint per round truncates the iterative lineage (a
    // cached-only loop accumulates a plan per round and recompute
    // cascades blow the heap); one emptiness probe decides termination.
    val prefsP = prefs.select(col("left_id"), col("pos"),
      col("right_id").as("p_right"), col("dist").as("p_dist"))

    var state = left.select(col("id").as("left_id"))
      .withColumn("pos", lit(1))
      .withColumn("eng_right", lit(null).cast(LongType))
      .withColumn("eng_dist", lit(null).cast(DoubleType))
      .localCheckpoint(true)

    var done = false
    while (!done) {
      // free lefts see their proposal at the pointer; engaged lefts keep
      // their engagement as their only candidate (proposal masked off)
      val joined = state.join(prefsP, Seq("left_id", "pos"), "left")
        .select(col("left_id"), col("pos"), col("eng_right"), col("eng_dist"),
          when(col("eng_right").isNull, col("p_right")).as("prop_right"),
          when(col("eng_right").isNull, col("p_dist")).as("prop_dist"))
      if (joined.where(col("prop_right").isNotNull).isEmpty) {
        done = true
      } else {
        // per right keep min (dist, left_id) among proposals ∪ engagements
        val wRight = Window.partitionBy(col("cand_right"))
          .orderBy(asc("cand_dist"), asc("left_id"))
        state = joined
          .withColumn("cand_right", coalesce(col("eng_right"), col("prop_right")))
          .withColumn("cand_dist", coalesce(col("eng_dist"), col("prop_dist")))
          .withColumn("rnk", row_number().over(wRight))
          .select(col("left_id"),
            (col("pos") + when(col("prop_right").isNotNull, 1).otherwise(0)).as("pos"),
            when(col("cand_right").isNotNull && col("rnk") === 1, col("cand_right")).as("eng_right"),
            when(col("cand_right").isNotNull && col("rnk") === 1, col("cand_dist")).as("eng_dist"))
          .localCheckpoint(true)
      }
    }
    prefs.unpersist()
    state.where(col("eng_right").isNotNull)
      .select(col("left_id"), col("eng_right").as("right_id"), col("eng_dist").as("dist"))
      .orderBy(col("left_id"))
  }
}
