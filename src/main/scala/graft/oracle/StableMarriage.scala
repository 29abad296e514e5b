package graft.oracle

import scala.collection.mutable

/** Sequential male-optimal Gale–Shapley — the in-memory oracle for the
  * distributed semantic join (reference `join`,
  * /root/reference/include/usearch/index.hpp:4321-4543: one-to-one
  * matching, each free "man" proposes down his preference list, women
  * keep the best proposal; `max_proposals` caps the list).
  *
  * Preferences: ascending (distance, partnerId) — the same total order
  * the distributed version uses, so results must match exactly.
  */
object StableMarriage {

  /** @param dist (leftId, rightId) → distance
    * @return matched pairs (leftId, rightId, distance), left-sorted
    */
  def solve(
      leftIds: Seq[Long],
      rightIds: Seq[Long],
      dist: (Long, Long) => Double,
      maxProposals: Int): Seq[(Long, Long, Double)] = {
    val prefs: Map[Long, IndexedSeq[(Long, Double)]] = leftIds.map { l =>
      l -> rightIds.map(r => (r, dist(l, r)))
        .sortBy { case (r, d) => (d, r) }
        .take(maxProposals)
        .toIndexedSeq
    }.toMap

    val nextIdx = mutable.HashMap(leftIds.map(_ -> 0): _*)
    val engagedTo = mutable.HashMap.empty[Long, (Long, Double)] // right -> (left, d)
    val free = mutable.Queue(leftIds.sorted: _*)

    while (free.nonEmpty) {
      val l = free.dequeue()
      val idx = nextIdx(l)
      val ps = prefs(l)
      if (idx < ps.length) {
        val (r, d) = ps(idx)
        nextIdx(l) = idx + 1
        engagedTo.get(r) match {
          case None => engagedTo(r) = (l, d)
          case Some((l2, d2)) =>
            // woman prefers smaller (distance, leftId)
            if (d < d2 || (d == d2 && l < l2)) {
              engagedTo(r) = (l, d)
              free.enqueue(l2)
            } else {
              free.enqueue(l)
            }
        }
      } // else exhausted: stays unmatched
    }
    engagedTo.toSeq.map { case (r, (l, d)) => (l, r, d) }.sortBy(_._1)
  }
}
