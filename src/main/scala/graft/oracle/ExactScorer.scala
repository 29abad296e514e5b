package graft.oracle

import scala.collection.mutable

import graft.analyze.Tokenizer
import graft.query.Bm25

/** In-memory exact BM25 scorer — the analog of the reference's
  * `search_exact_` full-scan path
  * (/root/reference/include/usearch/index.hpp:4251-4268 and
  * `exact_search_t` /root/reference/include/usearch/index_plugins.hpp:2071-2164):
  * distance to *every* member, bounded buffer keeps best k, fully ordered.
  *
  * This is the golden oracle the distributed WAND path must match
  * rank-identically (docIds AND scores) — usearch's recall/exact-match
  * test-suite analog (FIXTURES.md §4). Plain Scala loops, zero Spark.
  */
final class ExactScorer(docs: IndexedSeq[(Long, String)]) {

  private val nDocs: Long = docs.length.toLong
  // per-doc term frequencies + doc lengths
  private val tfByDoc: IndexedSeq[(Long, mutable.HashMap[String, Int], Long)] = docs.map {
    case (id, content) =>
      val toks = Tokenizer.tokenize(content)
      val m = new mutable.HashMap[String, Int]
      toks.foreach(t => m.update(t, m.getOrElse(t, 0) + 1))
      (id, m, toks.length.toLong)
  }
  private val dfByTerm: mutable.HashMap[String, Long] = {
    val m = new mutable.HashMap[String, Long]
    tfByDoc.foreach { case (_, tf, _) =>
      tf.keysIterator.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
    }
    m
  }
  val avgdl: Double = tfByDoc.map(_._3).sum.toDouble / nDocs.toDouble

  def df(term: String): Long = dfByTerm.getOrElse(term, 0L)

  /** Exact top-k: (docId, score), ordered (score desc, docId asc). Terms
    * are deduplicated and sorted so double accumulation order is fixed —
    * the same order the distributed path uses.
    */
  def search(query: String, k: Int): Array[(Long, Double)] = {
    val terms = Tokenizer.tokenize(query).distinct.sorted
    val withIdf = terms.flatMap { t =>
      val d = df(t)
      if (d == 0L) None else Some((t, Bm25.idf(d, nDocs)))
    }
    val scored = tfByDoc.iterator.flatMap { case (id, tf, dl) =>
      var s = 0.0
      var hit = false
      withIdf.foreach { case (t, idf) =>
        tf.get(t) match {
          case Some(f) => s += idf * Bm25.tfNorm(f, dl, avgdl); hit = true
          case None => ()
        }
      }
      if (hit) Some((id, s)) else None
    }.toArray
    scored
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
  }
}
