package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.TopKAgg
import graft.ops.Similarity

/** Distributed semantic join — the reference's stable-marriage `join`
  * (/root/reference/include/usearch/index.hpp:4321-4543, Python
  * `Index.join` /root/reference/python/usearch/index.py:1170-1200):
  * male-optimal one-to-one matching between two vector collections,
  * preference = ascending (cosine distance, partner id), proposals capped
  * at `maxProposals` (the reference defaults to log n + threads; lefts
  * that exhaust their list stay unmatched, as in the reference).
  *
  * Two preference-list generators feed the SAME Gale–Shapley rounds:
  *
  *   - [[join]] — EXACT: every (l, r) pair scored (the crossJoin is the
  *     oracle-shaped twin, like the dedup suite's quadratic n-gram
  *     Jaccard); the bounded [[TopKAgg]] buffers keep the *shuffle* at
  *     O(n·partitions·M) even though the compute is O(L·R).
  *   - [[joinIvf]] — the scale path, the reference's own design ("using
  *     approximate nearest neighbors search", index.hpp:4337-4338; each
  *     free man searches the index at :4470-4480): rights are k-means
  *     partitioned into `nlist` cells (the engine's IVF structure), each
  *     left scores ONLY rights in its `nprobe` nearest cells — compute
  *     drops to O(L·R·nprobe/nlist + L·nlist). Every step is
  *     deterministic (the engine's k-means discipline + total-order
  *     tie rules), so the approximate matching is a pure function of the
  *     data, reproducible in SQL ([[Similarity.semanticJoinAnnSql]]).
  *
  * Spark rendering of Gale–Shapley as batch-synchronous rounds — the GS
  * matching is proposal-order independent, so batched rounds produce
  * exactly the sequential male-optimal matching for the given preference
  * lists (verified against the in-memory oracle in SemanticJoinSpec):
  *
  *   round: every free left proposes at its list pointer; per right keep
  *   min (distance, leftId) among proposals ∪ engagements [one window];
  *   proposers advance their pointer. Stop when nobody can propose.
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

    // norms once per row BEFORE the crossJoin: the inline cosine form
    // recomputed both self-dots per PAIR (3× the flops of one dot);
    // dot/(lnorm·rnorm) is the identical double product, bit-for-bit
    val lv = left.select(col("id").as("left_id"),
      col("vec").cast("array<double>").as("lv"))
      .withColumn("lnorm", sqrt(Similarity.dot(col("lv"), col("lv"))))
    val rv = right.select(col("id").as("right_id"),
      col("vec").cast("array<double>").as("rv"))
      .withColumn("rnorm", sqrt(Similarity.dot(col("rv"), col("rv"))))
    val scored = lv.crossJoin(rv)
      .select(col("left_id"), col("right_id"),
        (lit(1.0) - Similarity.dot(col("lv"), col("rv")) / (col("lnorm") * col("rnorm")))
          .as("dist"))
    gsRounds(spark, left, prefsOf(scored, maxProposals))
  }

  /** ANN-candidate stable marriage (see object doc): preference lists
    * come from the engine's IVF machinery instead of all pairs.
    *
    * @param nlist  k-means cells partitioning the right side
    * @param nprobe cells each left scores against (recall/compute knob;
    *               nprobe = nlist degenerates to the exact [[join]])
    */
  def joinIvf(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      maxProposals: Int,
      nlist: Int,
      nprobe: Int,
      kmeansIters: Int): DataFrame = {
    val (scored, km) = ivfScored(spark, left, right, nlist, nprobe, kmeansIters)
    val out = gsRounds(spark, left, prefsOf(scored, maxProposals))
    km.centroids.unpersist()
    km.assignments.unpersist()
    out
  }

  /** [[joinIvf]] against a PRE-BUILT cell structure (centroids: (cid,
    * cvec), assignments: (cid, id)) — the reference's model: the join
    * queries an index that already exists (index.hpp:4337-4338); fitting
    * it per call charges an index build to every query. k-means is
    * deterministic, so pre-built vs freshly-fitted cells give the
    * identical matching.
    */
  def joinIvfWith(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      maxProposals: Int,
      nprobe: Int,
      centroids: DataFrame,
      assignments: DataFrame): DataFrame =
    gsRounds(spark, left,
      prefsOf(scoredAgainstCells(left, right, nprobe, centroids, assignments), maxProposals))

  /** The ANN candidate-scored (left_id, right_id, dist) pairs plus the
    * fitted IVF structure (the caller owns the Result's caches) —
    * separated from [[joinIvf]] so tests can pin the candidate plan shape
    * (the GS rounds checkpoint their lineage away).
    */
  def ivfScored(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      nlist: Int,
      nprobe: Int,
      kmeansIters: Int): (DataFrame, KMeans.Result) = {
    val km = KMeans.fit(spark,
      right.select(col("id"), col("vec")), k = nlist, iterations = kmeansIters)
    (scoredAgainstCells(left, right, nprobe, km.centroids,
      km.assignments.select(col("cid"), col("id"))), km)
  }

  private def scoredAgainstCells(
      left: DataFrame,
      right: DataFrame,
      nprobe: Int,
      centroids: DataFrame,
      assignments: DataFrame): DataFrame = {
    // nprobe nearest cells per left by (l2sq, cid) — the same distance the
    // k-means geometry was built with; nlist rows broadcast
    val lv = left.select(col("id").as("left_id"),
      col("vec").cast("array<double>").as("lv"))
      .withColumn("lnorm", sqrt(Similarity.dot(col("lv"), col("lv"))))
    val probed = lv.crossJoin(broadcast(centroids))
      .select(col("left_id"), col("lv"), col("lnorm"),
        struct(
          (Similarity.dot(col("lv"), col("lv"))
            - lit(2.0) * Similarity.dot(col("lv"), col("cvec"))
            + Similarity.dot(col("cvec"), col("cvec"))).as("cdist"),
          col("cid").as("cid")).as("dc"))
      .groupBy(col("left_id"))
      .agg(TopKAgg.least(col("dc.cdist"), col("dc.cid"), nprobe).as("cells"),
        first(col("lv")).as("lv"), first(col("lnorm")).as("lnorm"))
      .select(col("left_id"), col("lv"), col("lnorm"),
        explode(col("cells")).as("c"))
      .select(col("left_id"), col("lv"), col("lnorm"), col("c.id").as("cid"))

    // candidates = rights in probed cells only — the equi-join replaces
    // the crossJoin; compute is O(L·R·nprobe/nlist)
    val rv = right.select(col("id").as("right_id"),
      col("vec").cast("array<double>").as("rv"))
      .withColumn("rnorm", sqrt(Similarity.dot(col("rv"), col("rv"))))
    probed
      .join(assignments.select(col("cid"), col("id").as("right_id")), "cid")
      .join(rv, "right_id")
      .select(col("left_id"), col("right_id"),
        (lit(1.0) - Similarity.dot(col("lv"), col("rv")) / (col("lnorm") * col("rnorm")))
          .as("dist"))
  }

  /** Per-left top-M preference ARRAYS from scored (left_id, right_id,
    * dist) rows, via the bounded top-k aggregate (map-side partial →
    * O(lefts·M) shuffle, never the scored rows). Best-first
    * array<struct<score,id>> — index p is the p-th proposal.
    */
  private def prefsOf(scored: DataFrame, maxProposals: Int): DataFrame =
    scored
      .groupBy(col("left_id"))
      .agg(TopKAgg.least(col("dist"), col("right_id"), maxProposals).as("cands"))

  /** Batch-synchronous Gale–Shapley over the given preference lists.
    * Single state row per left: (pointer, engagement) — the identical
    * encoding the SQL oracle's recursive CTE carries, plus the left's
    * OWN bounded preference array riding in the row (≤ maxProposals
    * structs): a proposal is an `element_at(cands, pos)` lookup instead
    * of a per-round join against a preference table, so each round is
    * ONE exchange (the per-right window) and ONE job — the lazy
    * localCheckpoint is materialized by the same count that decides
    * termination (a filter cannot prune an RDD-backed plan, so the count
    * computes and persists every state row). Checkpointing per round
    * still truncates the iterative lineage (a cached-only loop
    * accumulates a plan per round and recompute cascades blow the heap).
    */
  private def gsRounds(
      spark: SparkSession,
      left: DataFrame,
      prefsIn: DataFrame): DataFrame = {
    // positions are contiguous 1..size(cands) (best-first array), so
    // "this left can still propose" ≡ pos ≤ npos; lefts with no scored
    // candidates carry an empty array (npos = 0)
    var state = left.select(col("id").as("left_id"))
      .join(prefsIn, Seq("left_id"), "left")
      .withColumn("npos", coalesce(size(col("cands")), lit(0)))
      .withColumn("pos", lit(1))
      .withColumn("eng_right", lit(null).cast(LongType))
      .withColumn("eng_dist", lit(null).cast(DoubleType))
      .localCheckpoint(false)

    def proposers(): Long =
      state.where(col("eng_right").isNull && col("pos") <= col("npos")).count()

    var pending = proposers()
    var rounds = 0
    while (pending > 0) {
      // free lefts see their proposal at the pointer; engaged lefts keep
      // their engagement as their only candidate (proposal masked off)
      val canProp = col("eng_right").isNull && col("pos") <= col("npos")
      val joined = state
        .select(col("left_id"), col("cands"), col("pos"), col("npos"),
          col("eng_right"), col("eng_dist"),
          when(canProp, element_at(col("cands"), col("pos"))("id")).as("prop_right"),
          when(canProp, element_at(col("cands"), col("pos"))("score")).as("prop_dist"))
      // per right keep min (dist, left_id) among proposals ∪ engagements
      val wRight = Window.partitionBy(col("cand_right"))
        .orderBy(asc("cand_dist"), asc("left_id"))
      state = joined
        .withColumn("cand_right", coalesce(col("eng_right"), col("prop_right")))
        .withColumn("cand_dist", coalesce(col("eng_dist"), col("prop_dist")))
        .withColumn("rnk", row_number().over(wRight))
        .select(col("left_id"), col("cands"), col("npos"),
          (col("pos") + when(col("prop_right").isNotNull, 1).otherwise(0)).as("pos"),
          when(col("cand_right").isNotNull && col("rnk") === 1, col("cand_right")).as("eng_right"),
          when(col("cand_right").isNotNull && col("rnk") === 1, col("cand_dist")).as("eng_dist"))
        .localCheckpoint(false)
      pending = proposers()
      rounds += 1
      if (sys.env.contains("GRAFT_DEBUG_ROUNDS"))
        System.err.println(s"gsRounds round $rounds pending=$pending")
    }
    state.where(col("eng_right").isNotNull)
      .select(col("left_id"), col("eng_right").as("right_id"), col("eng_dist").as("dist"))
      .orderBy(col("left_id"))
  }
}
