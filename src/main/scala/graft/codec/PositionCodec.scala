package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Decoded positional postings for one term within one docId bucket:
  * strictly-ascending docIds, and for each doc the ascending in-document
  * token positions of the term (positions.length == docIds.length;
  * positions(i).length == tf of the term in doc i).
  */
final case class PosPostings(docIds: Array[Long], positions: Array[Array[Int]]) {
  require(docIds.length == positions.length)
  def size: Int = docIds.length
}

/** Delta + varbyte codec for POSITIONAL posting blocks — the separate
  * positions sidecar of the index (Lucene keeps .pos apart from .doc for
  * the same reason: frequency-only queries never pay position bytes).
  * The reference advertises exact text retrieval over variable-length
  * payloads (/root/reference/README.md:3-4, cpp/test.cpp:982-1060); graft
  * stores term positions so phrase/proximity queries are answered from
  * the index alone, never a corpus re-read.
  *
  * Block layout (one block ≤ [[PostingCodec.BlockSize]] docs, aligned to
  * the same 128-doc boundaries as the frequency blocks):
  * `[n:varint][docGap:varint]*n  ([tf:varint][posGap:varint]*tf)*n`
  * — docIds gap-encoded exactly like [[PostingCodec]]; each doc's
  * positions gap-encoded within the doc (first position absolute).
  */
object PositionCodec {

  private def writeVarLong(buf: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += (v & 0x7f).toByte
  }

  private def readVarLong(bytes: Array[Byte], offset: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = offset
    var b = bytes(i)
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift
      shift += 7
      i += 1
      b = bytes(i)
    }
    v |= (b & 0x7fL) << shift
    (v, i + 1)
  }

  /** Encode docs [from, until) of a term's positional list into one block. */
  def encodeBlock(
      docIds: Array[Long],
      positions: Array[Array[Int]],
      from: Int,
      until: Int): Array[Byte] = {
    val buf = new ArrayBuffer[Byte]((until - from) * 6 + 4)
    writeVarLong(buf, (until - from).toLong)
    var prev = 0L
    var i = from
    while (i < until) {
      writeVarLong(buf, if (i == from) docIds(i) else docIds(i) - prev)
      prev = docIds(i)
      i += 1
    }
    i = from
    while (i < until) {
      val ps = positions(i)
      writeVarLong(buf, ps.length.toLong)
      var j = 0
      var pp = 0
      while (j < ps.length) {
        writeVarLong(buf, (if (j == 0) ps(j) else ps(j) - pp).toLong)
        pp = ps(j)
        j += 1
      }
      i += 1
    }
    buf.toArray
  }

  def decodeBlock(bytes: Array[Byte]): PosPostings = {
    val (n0, o0) = readVarLong(bytes, 0)
    val n = n0.toInt
    val docIds = new Array[Long](n)
    val positions = new Array[Array[Int]](n)
    var off = o0
    var prev = 0L
    var i = 0
    while (i < n) {
      val (gap, next) = readVarLong(bytes, off)
      prev = if (i == 0) gap else prev + gap
      docIds(i) = prev
      off = next
      i += 1
    }
    i = 0
    while (i < n) {
      val (tf0, oTf) = readVarLong(bytes, off)
      off = oTf
      val tf = tf0.toInt
      val ps = new Array[Int](tf)
      var j = 0
      var pp = 0
      while (j < tf) {
        val (g, next) = readVarLong(bytes, off)
        pp = if (j == 0) g.toInt else pp + g.toInt
        ps(j) = pp
        off = next
        j += 1
      }
      positions(i) = ps
      i += 1
    }
    PosPostings(docIds, positions)
  }

  /** Split a term's full (docId-sorted) positional list into blocks on
    * the shared [[PostingCodec.BlockSize]] boundary.
    */
  def encodeBlocks(
      docIds: Array[Long],
      positions: Array[Array[Int]]): Array[(Long, Long, Int, Array[Byte])] = {
    val n = docIds.length
    val out = new ArrayBuffer[(Long, Long, Int, Array[Byte])](n / PostingCodec.BlockSize + 1)
    var from = 0
    while (from < n) {
      val until = math.min(from + PostingCodec.BlockSize, n)
      out += ((docIds(from), docIds(until - 1), until - from,
        encodeBlock(docIds, positions, from, until)))
      from = until
    }
    out.toArray
  }

  def decodeBlocks(blocks: Seq[Array[Byte]]): PosPostings = {
    val parts = blocks.map(decodeBlock)
    val n = parts.map(_.size).sum
    val docIds = new Array[Long](n)
    val positions = new Array[Array[Int]](n)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p.docIds, 0, docIds, off, p.size)
      System.arraycopy(p.positions, 0, positions, off, p.size)
      off += p.size
    }
    PosPostings(docIds, positions)
  }
}
