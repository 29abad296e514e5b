package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.PostingCodec

/** decode ∘ encode = id over random sorted posting lists (the reference's
  * save/load round-trip analog, /root/reference/cpp/test.cpp:206-310).
  * ScalaCheck driven with a fixed seed for reproducibility.
  */
class CodecSpec extends AnyFunSuite {

  private val postingsGen: Gen[(Array[Long], Array[Int])] = for {
    n <- Gen.chooseNum(0, 700)
    gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 1000000L))
    tfs <- Gen.listOfN(n, Gen.chooseNum(1, 5000))
  } yield {
    val ids = gaps.scanLeft(0L)(_ + _).tail.toArray
    (ids, tfs.toArray)
  }

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200).withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("block encode/decode round-trip (ScalaCheck, 200 cases)") {
    check(Prop.forAllNoShrink(postingsGen) { case (ids, tfs) =>
      val blocks = PostingCodec.encodeBlocks(ids, tfs, i => tfs(i).toDouble)
      val decoded = PostingCodec.decodeBlocks(blocks.map(_.bytes).toSeq)
      val roundTrip = decoded.docIds.sameElements(ids) && decoded.tfs.sameElements(tfs)
      // block invariants: bounds cover members, maxTfNorm is a true max
      var off = 0
      var invariants = true
      blocks.foreach { b =>
        invariants &&= b.firstDocId == ids(off) && b.lastDocId == ids(off + b.count - 1)
        var i = off
        while (i < off + b.count) { invariants &&= tfs(i).toDouble <= b.maxTfNorm; i += 1 }
        off += b.count
      }
      roundTrip && invariants && off == ids.length
    })
  }

  private val posPostingsGen: Gen[(Array[Long], Array[Array[Int]])] = for {
    n <- Gen.chooseNum(0, 400)
    gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 100000L))
    seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
  } yield {
    val ids = gaps.scanLeft(0L)(_ + _).tail.toArray
    val rnd = new scala.util.Random(seed)
    val positions = Array.fill(n) {
      val tf = 1 + rnd.nextInt(40)
      // ascending in-doc positions, first may be 0, gaps ≥ 1
      Array.iterate(rnd.nextInt(50), tf)(p => p + 1 + rnd.nextInt(30))
    }
    (ids, positions)
  }

  test("positional block encode/decode round-trip (ScalaCheck, 200 cases)") {
    import graft.codec.PositionCodec
    check(Prop.forAllNoShrink(posPostingsGen) { case (ids, poss) =>
      val blocks = PositionCodec.encodeBlocks(ids, poss)
      val decoded = PositionCodec.decodeBlocks(blocks.map(_._4).toSeq)
      // blocks align to the same boundary as the frequency codec and
      // carry true (first, last, count) bounds
      var off = 0
      var invariants = true
      blocks.foreach { case (first, last, count, _) =>
        invariants &&= count <= PostingCodec.BlockSize &&
          first == ids(off) && last == ids(off + count - 1)
        off += count
      }
      decoded.docIds.sameElements(ids) && off == ids.length && invariants &&
        decoded.positions.length == poss.length &&
        decoded.positions.indices.forall(i => decoded.positions(i).sameElements(poss(i)))
    })
  }

  test("compression is effective on dense postings") {
    val ids = Array.tabulate(10000)(i => i.toLong * 2)
    val tfs = Array.fill(10000)(3)
    val blocks = PostingCodec.encodeBlocks(ids, tfs, _ => 1.0)
    val bytes = blocks.map(_.bytes.length).sum
    assert(bytes < 10000 * 3) // ≪ 12 bytes/posting raw
  }
}
