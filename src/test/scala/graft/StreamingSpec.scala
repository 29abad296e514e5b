package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.corpus.{CorpusDoc, CorpusGen}
import graft.index.{IndexBuilder, MultiSearcher, Searcher, SegmentMerger}
import graft.streaming.StreamingIngest

/** Streaming ingest lifecycle: micro-batches → L0 generations →
  * scatter-gather queries → compaction; end state identical to a batch
  * build (the concurrent-add analog,
  * /root/reference/cpp/test.cpp:603 concurrent updates test).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val n = 120

  test("micro-batch ingest + compaction equals batch build") {
    val rootDir = Files.createTempDirectory("graft-stream-").toString
    val docs = CorpusGen.generateLocal(n)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CorpusDoc]
    val query = StreamingIngest.start(spark, mem.toDF(), rootDir)

    mem.addData(docs.take(40))
    query.processAllAvailable()
    mem.addData(docs.slice(40, 90))
    query.processAllAvailable()
    mem.addData(docs.drop(90))
    query.processAllAvailable()
    query.stop()

    val gens = StreamingIngest.generations(rootDir)
    assert(gens.size == 3, s"expected 3 generations, got $gens")
    assert(StreamingIngest.nextDocId(rootDir) == n.toLong)

    // batch reference: same per-batch id assignment ((repo,path,commit)
    // order within batch + running offset)
    val batches = Seq(docs.take(40), docs.slice(40, 90), docs.drop(90))
    var offset = 0L
    val idued = batches.flatMap { b =>
      val sorted = b.sortBy(d => (d.repo, d.path, d.commit))
      val out = sorted.zipWithIndex.map { case (d, i) => (offset + i, d.content) }
      offset += b.size
      out
    }
    val batchRoot = Files.createTempDirectory("graft-stream-batch-").toString
    IndexBuilder.build(spark, idued.toDF("doc_id", "content"), batchRoot, targetBuckets = 4)

    val multi = new MultiSearcher(spark, gens)
    val single = new Searcher(spark, batchRoot)
    assert(multi.nDocs == single.stats.nDocs)

    val queries = CorpusGen.querySet(8)
    def topk(df: org.apache.spark.sql.DataFrame) = df.as[(Long, Double)].collect().toSeq
    queries.foreach { case (qid, q) =>
      assert(topk(multi.search(q, 10)) == topk(single.search(q, 10)), s"multi q$qid")
    }

    // compact the L0 generations and re-check
    val compacted = Files.createTempDirectory("graft-stream-compact-").toString
    SegmentMerger.merge(spark, gens, compacted, targetBuckets = 4)
    val merged = new Searcher(spark, compacted)
    queries.foreach { case (qid, q) =>
      assert(topk(merged.search(q, 10)) == topk(single.search(q, 10)), s"merged q$qid")
    }
  }
}
