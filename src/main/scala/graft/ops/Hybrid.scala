package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analyze.Tokenizer

/** HYBRID retrieval — Reciprocal Rank Fusion (RRF) of the lexical BM25
  * engine and exact vector kNN over the embeddings table, the fusion a
  * user of the reference runs when pairing usearch's vector index with a
  * keyword engine (the README's "Semantic Search" + "Exact vs.
  * Approximate Search" pairing, /root/reference/README.md:115-180).
  *
  * RRF (Cormack/Clarke/Buettcher, SIGIR 2009): fused(d) = Σ_sources
  * 1/(damp + rank_source(d)), damp = 60. Ranks are INTEGERS from each
  * source's own deterministic total order, and the fused score is kept
  * in integer parts-per-million (`1000000 div (damp + rank)` — floor
  * division of positive ints is identical in Spark and DuckDB), so the
  * entry is bit-exact cross-engine with no float contract at all — the
  * same fixed-point discipline as the NDCG entries.
  *
  * Scale shape: the lexical list comes from the pruned-postings batched
  * engine pass ([[graft.index.Searcher.searchMany]]); the vector list is
  * one distributed scan with a map-side bounded top-k aggregate
  * ([[graft.functions.TopKAgg]]); fusion then joins two ≤ depth·|queries|
  * row lists — driver- and shuffle-cost independent of corpus size.
  */
object Hybrid {

  /** Standard RRF damping constant (the SIGIR'09 paper's k=60). */
  final val RrfDamp = 60

  /** Per-source candidate depth before fusion. */
  final val Depth = 20

  /** (query_id, lexical query string, query vec_id) for the batched
    * entry: the reference lexical query on the reference vector; a
    * different pairing; and a query whose only surviving lexical term is
    * rarer (with a dictionary-absent canary term that must drop out at
    * planning), exercising the asymmetric fusion where one source
    * dominates.
    */
  final val HybridQueries: Seq[(Int, String, Long)] = Seq(
    (0, "spark merge dup", 0L),
    (1, "customer window", 7L),
    (2, "zzznope vector", 42L))

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Batched hybrid search: fuse each query's BM25 top-`depth` and
    * cosine-kNN top-`depth` by RRF, return the fused top-`k` as
    * (query_id, rank, doc_id, lex_rank, vec_rank, rrf_ppm) — source
    * ranks 0 when the doc is absent from that source's list. Embedding
    * rows are keyed by vec_id = doc_id (the testdata contract).
    */
  def rrfMany(
      spark: SparkSession,
      dir: String,
      queries: Seq[(Int, String, Long)] = HybridQueries,
      depth: Int = Depth,
      k: Int = Fulltext.K): DataFrame =
    fuse(lexRanks(spark, dir, queries, depth),
      vecRanksExact(spark, dir, queries, depth), k)

  /** [[rrfMany]] with the vector source served by the IVF ANN index
    * (cell-partitioned candidate pruning) instead of the brute-force
    * scan — the 100 TB deployment shape for the vector half. At
    * `nprobe = nlist` the probe is exhaustive, so the fused result must
    * equal [[rrfMany]] exactly (HybridSpec pins it; the driver entry
    * runs this config against the SAME oracle); approximate configs
    * trade vector recall for probe cost as measured by the IVF recall
    * curve.
    */
  def rrfManyIvf(
      spark: SparkSession,
      dir: String,
      queries: Seq[(Int, String, Long)] = HybridQueries,
      depth: Int = Depth,
      k: Int = Fulltext.K,
      nlist: Int = 8,
      nprobe: Int = 8): DataFrame =
    fuse(lexRanks(spark, dir, queries, depth),
      vecRanksIvf(spark, dir, queries, depth, nlist, nprobe), k)

  /** Lexical source: one batched engine pass; rank = the engine's own
    * (score desc, doc_id asc) total order, assigned over ≤ depth rows
    * per query.
    */
  private def lexRanks(
      spark: SparkSession, dir: String,
      queries: Seq[(Int, String, Long)], depth: Int): DataFrame = {
    val s = Fulltext.indexFor(spark, dir)
    val wLex = Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
    s.searchMany(queries.map { case (qid, q, _) => (qid, q) }, depth)
      .select(col("query_id"), col("doc_id"),
        row_number().over(wLex).as("lex_rank"))
  }

  /** Broadcast (query_id, query vector) rows for the fused queries. */
  private def queryVecs(
      spark: SparkSession, dir: String,
      queries: Seq[(Int, String, Long)]): DataFrame = {
    import spark.implicits._
    broadcast(
      queries.map { case (qid, _, vid) => (qid, vid) }.toDF("query_id", "qvec_id")
        .join(emb(spark, dir).select(col("vec_id").as("qvec_id"), col("embedding").as("qv")),
          "qvec_id")
        .select(col("query_id"), col("qv")))
  }

  /** (query_id, doc_id, vec_rank) from ranked candidate cosines — the
    * bounded per-query top-k aggregate (map-side partials); posexplode
    * order IS the (cos desc, id asc) rank.
    */
  private def rankCandidates(cand: DataFrame, depth: Int): DataFrame =
    cand
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.greatest(col("cos_raw"), col("vec_id"), depth).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("rnk0", "h")))
      .select(col("query_id"), col("h.id").as("doc_id"),
        (col("rnk0") + 1).cast("int").as("vec_rank"))

  /** Vector source, exact: broadcast the query vectors, one corpus scan. */
  private def vecRanksExact(
      spark: SparkSession, dir: String,
      queries: Seq[(Int, String, Long)], depth: Int): DataFrame = {
    val qv = queryVecs(spark, dir, queries)
    rankCandidates(
      emb(spark, dir).crossJoin(qv)
        .select(col("query_id"), col("vec_id"),
          Similarity.cosine(col("embedding"), col("qv")).as("cos_raw")),
      depth)
  }

  /** Vector source, IVF ANN: per-query probe selection over the
    * broadcast centroids (bounded TopKAgg), candidates from ONE
    * partition-pruned join against the cell-partitioned assignments —
    * [[Similarity.ivfKnnMany]]'s plan with the fused queries' vectors.
    */
  private def vecRanksIvf(
      spark: SparkSession, dir: String,
      queries: Seq[(Int, String, Long)], depth: Int,
      nlist: Int, nprobe: Int): DataFrame = {
    val ivf = Similarity.ivfIndexFor(spark, dir, nlist)
    val qv = queryVecs(spark, dir, queries)
    val probeDf = broadcast(
      qv.crossJoin(broadcast(ivf.centroids.select(col("cid"), col("cvec").as("cv"))))
        .select(col("query_id"), col("cid"),
          Similarity.cosine(col("qv"), col("cv")).as("c_cos"))
        .groupBy(col("query_id"))
        .agg(graft.functions.TopKAgg.greatest(col("c_cos"), col("cid"), nprobe).as("cells"))
        .select(col("query_id"), explode(col("cells.id")).as("cid")))
    rankCandidates(
      ivf.assignments
        .join(probeDf, "cid")
        .select(col("query_id"), col("id").as("vec_id"))
        .join(emb(spark, dir), "vec_id")
        .join(qv, "query_id")
        .select(col("query_id"), col("vec_id"),
          Similarity.cosine(col("embedding"), col("qv")).as("cos_raw")),
      depth)
  }

  /** Fusion: ≤ 2·depth rows per query; the ppm parts divide BEFORE the
    * null-coalesce so an absent source contributes exactly 0.
    */
  private def fuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame = {
    val wFused = Window.partitionBy("query_id").orderBy(desc("rrf_ppm"), asc("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        (coalesce(expr(s"1000000 div ($RrfDamp + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfDamp + vec_rank)"), lit(0L))).as("rrf_ppm"))
      .withColumn("rank", row_number().over(wFused))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("lex_rank"), col("vec_rank"), col("rrf_ppm"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Single-query hybrid entry: the reference query fused with the
    * reference vector.
    */
  def engHybridRrf(spark: SparkSession, dir: String): DataFrame =
    rrfMany(spark, dir, Seq((0, Fulltext.RefQuery.mkString(" "), 0L)))
      .drop("query_id")

  def engHybridRrfMany(spark: SparkSession, dir: String): DataFrame =
    rrfMany(spark, dir)

  /** ANN-backed hybrid entry at the exhaustive probe (nprobe = nlist):
    * the full IVF machinery on the vector half must reproduce the exact
    * fusion bit-for-bit, so it shares [[hybridRrfManySql]].
    */
  def engHybridRrfAnn(spark: SparkSession, dir: String): DataFrame =
    rrfManyIvf(spark, dir)

  /** Oracle for one fused query: the lexical ranks recompute the BM25
    * top-`depth` with the deterministic literal-term fold (ranks on the
    * RAW double — bit-identical to the engine's sorted-term left fold,
    * so the integer ranks agree exactly); the vector ranks recompute the
    * cosine top-`depth` in the same element order as the Spark side; the
    * fusion is all-integer.
    */
  private def rrfOneSql(
      qid: Int, query: String, vecId: Long, depth: Int, k: Int,
      withQueryId: Boolean): String = {
    val terms = Tokenizer.tokenize(query).distinct.sorted.toSeq
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val fold = terms.map(t =>
      s"COALESCE(MAX(CASE WHEN tf.term = '$t' THEN ${graft.query.Bm25.sqlScore("tf.tf", "dfq.df", "dl.dl", "st.n", "st.avgdl")} END), 0.0)")
      .mkString("(", " + ", ")")
    val qidCol = if (withQueryId) s"$qid AS query_id, " else ""
    s"""SELECT $qidCol CAST(rnk AS INT) AS rank, doc_id, lex_rank, vec_rank, rrf_ppm FROM (
       |  WITH tok AS (SELECT doc_id, unnest(${Tokenizer.duckdbTokensSql("text")}) AS term FROM documents),
       |  tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |  dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |  st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
       |                CAST((SELECT sum(tf) FROM tf) AS DOUBLE) / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
       |  dfq AS (SELECT term, count(*) AS df FROM tf WHERE term IN ($termList) GROUP BY 1),
       |  lexall AS (
       |    SELECT tf.doc_id,
       |           row_number() OVER (ORDER BY $fold DESC, tf.doc_id) AS lex_rank
       |    FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       |    WHERE tf.term IN ($termList)
       |    GROUP BY tf.doc_id),
       |  lex AS (SELECT doc_id, lex_rank FROM lexall WHERE lex_rank <= $depth),
       |  vecall AS (
       |    SELECT e.vec_id AS doc_id,
       |           row_number() OVER (ORDER BY ${Similarity.cosineSql("e.embedding", "q.q_embedding")} DESC, e.vec_id) AS vec_rank
       |    FROM embeddings e, (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = $vecId) q),
       |  vec AS (SELECT doc_id, vec_rank FROM vecall WHERE vec_rank <= $depth),
       |  fused AS (
       |    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |           CAST(COALESCE(lex.lex_rank, 0) AS INT) AS lex_rank,
       |           CAST(COALESCE(vec.vec_rank, 0) AS INT) AS vec_rank,
       |           CAST(COALESCE(1000000 // ($RrfDamp + lex.lex_rank), 0)
       |              + COALESCE(1000000 // ($RrfDamp + vec.vec_rank), 0) AS BIGINT) AS rrf_ppm
       |    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
       |  SELECT doc_id, lex_rank, vec_rank, rrf_ppm,
       |         row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS rnk
       |  FROM fused) x
       |WHERE rnk <= $k""".stripMargin
  }

  def hybridRrfSql(depth: Int = Depth, k: Int = Fulltext.K): String =
    s"""SELECT rank, doc_id, lex_rank, vec_rank, rrf_ppm FROM (
       |${rrfOneSql(0, Fulltext.RefQuery.mkString(" "), 0L, depth, k, withQueryId = false)}
       |) u ORDER BY rank""".stripMargin

  def hybridRrfManySql(
      queries: Seq[(Int, String, Long)] = HybridQueries,
      depth: Int = Depth,
      k: Int = Fulltext.K): String = {
    val selects = queries.map { case (qid, q, vid) =>
      rrfOneSql(qid, q, vid, depth, k, withQueryId = true)
    }
    s"""SELECT query_id, rank, doc_id, lex_rank, vec_rank, rrf_ppm FROM (
       |${selects.mkString("\nUNION ALL\n")}
       |) u ORDER BY query_id, rank""".stripMargin
  }
}
