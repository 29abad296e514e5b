package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analyze.Tokenizer

/** Streaming PERCOLATION — match ARRIVING documents against STORED
  * queries as they flow (the alerting/routing deployment of the reverse
  * search in [[graft.ops.Fulltext.percolate]]; the reference's streaming
  * analog is concurrent add-then-search,
  * /root/reference/include/usearch/index.hpp:2780-2880).
  *
  * The transform is STATELESS and append-mode safe by construction: one
  * stream-static join against the (tiny, broadcast) stored-query table
  * and a per-row conjunctive containment filter expressed with
  * higher-order builtins (`forall` + `array_contains` — codegen, no UDF,
  * no aggregation state, no watermark). A micro-batch costs
  * O(batch tokens · queries) with zero shuffle on the stream side —
  * exactly the routing shape that holds at any arrival rate; the stored
  * queries are the only state and they live in the broadcast.
  *
  * Semantics are pinned to the batch operator: a doc matches a query iff
  * its token set contains EVERY query term (StreamingPercolateSpec pins
  * streamed ≡ batch across micro-batch boundaries).
  */
object StreamingPercolate {

  /** Attach percolation to `arrivals` (doc_id, text — streaming OR
    * static): returns (query_id, doc_id) match rows. Queries with no
    * surviving tokens are dropped at planning (they can match nothing).
    */
  def attach(arrivals: DataFrame,
      queries: Seq[(Int, Seq[String])]): DataFrame = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    val qNorm = queries
      .map { case (qid, ts) => (qid, ts.flatMap(Tokenizer.tokenize).distinct.sorted) }
      .filter(_._2.nonEmpty)
    val qdf = broadcast(qNorm.toDF("query_id", "qterms"))
    val toks: Column = Tokenizer.tokensCol(col("text"))
    arrivals
      .select(col("doc_id"), toks.as("toks"))
      .join(qdf, forall(col("qterms"), t => array_contains(col("toks"), t)))
      .select(col("query_id"), col("doc_id"))
  }
}
