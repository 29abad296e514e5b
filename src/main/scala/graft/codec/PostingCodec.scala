package graft.codec

import scala.collection.mutable.ArrayBuffer

/** A decoded posting list for one term (within one doc-id bucket):
  * strictly-ascending docIds with parallel term frequencies.
  */
final case class Postings(docIds: Array[Long], tfs: Array[Int]) {
  require(docIds.length == tfs.length)
  def size: Int = docIds.length
}

/** One encoded 128-posting block: delta+varbyte docIds, varbyte tfs, and
  * the block's max tf-normalization (block-max WAND upper bound — analog
  * of the reference's kth-distance radius pruning,
  * /root/reference/include/usearch/index.hpp:4210-4211).
  */
final case class PostingBlock(
    firstDocId: Long,
    lastDocId: Long,
    count: Int,
    maxTfNorm: Double,
    bytes: Array[Byte])

/** Delta + variable-byte posting compression (SURVEY.md §7.3.1): docIds are
  * gap-encoded then varbyte'd; tfs varbyte'd. Pure Scala, allocation-light,
  * runs inside typed Dataset ops (no UDF registry needed).
  */
object PostingCodec {
  final val BlockSize = 128

  // --- varbyte primitives ---------------------------------------------

  private def writeVarLong(buf: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += (v & 0x7f).toByte
  }

  /** Returns (value, nextOffset). */
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

  // --- block encode/decode --------------------------------------------

  /** Encode one block: [count:varint][docGaps:varint*][tfs:varint*]. */
  def encodeBlock(docIds: Array[Long], tfs: Array[Int], from: Int, until: Int): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](((until - from) * 3) + 4)
    writeVarLong(buf, (until - from).toLong)
    var prev = 0L
    var i = from
    while (i < until) {
      val gap = if (i == from) docIds(i) else docIds(i) - prev
      writeVarLong(buf, gap)
      prev = docIds(i)
      i += 1
    }
    i = from
    while (i < until) {
      writeVarLong(buf, tfs(i).toLong)
      i += 1
    }
    buf.toArray
  }

  def decodeBlock(bytes: Array[Byte]): Postings = {
    val (n0, o0) = readVarLong(bytes, 0)
    val n = n0.toInt
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
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
      val (tf, next) = readVarLong(bytes, off)
      tfs(i) = tf.toInt
      off = next
      i += 1
    }
    Postings(docIds, tfs)
  }

  /** Split a full (sorted) posting list into encoded blocks with block-max
    * tf-norm summaries. `tfNorm(i)` must return the tf-normalization of
    * posting i (needs docLen, supplied by the builder).
    */
  def encodeBlocks(
      docIds: Array[Long],
      tfs: Array[Int],
      tfNormAt: Int => Double): Array[PostingBlock] = {
    val n = docIds.length
    val out = new ArrayBuffer[PostingBlock](n / BlockSize + 1)
    var from = 0
    while (from < n) {
      val until = math.min(from + BlockSize, n)
      var mx = 0.0
      var i = from
      while (i < until) { val s = tfNormAt(i); if (s > mx) mx = s; i += 1 }
      out += PostingBlock(docIds(from), docIds(until - 1), until - from, mx,
        encodeBlock(docIds, tfs, from, until))
      from = until
    }
    out.toArray
  }

  def decodeBlocks(blocks: Seq[Array[Byte]]): Postings = {
    val parts = blocks.map(decodeBlock)
    val n = parts.map(_.size).sum
    val docIds = new Array[Long](n)
    val tfs = new Array[Int](n)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p.docIds, 0, docIds, off, p.size)
      System.arraycopy(p.tfs, 0, tfs, off, p.size)
      off += p.size
    }
    Postings(docIds, tfs)
  }
}
