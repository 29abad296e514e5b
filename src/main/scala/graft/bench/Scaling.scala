package graft.bench

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, Searcher}

/** Two-parallelism scaling evidence for the north rule's N→4N criterion:
  * the same build+query job at local[8] and local[32] over the same
  * synthesized corpus; reports files/sec at both and
  * efficiency = throughput(32) / (4 × throughput(8)).
  * (A real two-size executor cluster is not available in this sandbox;
  * this two-parallelism local run is the driver-sanctioned evidence.)
  *
  * Usage: runMain graft.bench.Scaling [nDocs] — writes one JSON line.
  */
object Scaling {

  private def deleteRec(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(deleteRec)
    p.delete()
  }

  final case class RunResult(cpus: Int, buildSec: Double, buildFps: Double,
      batchSec: Double, qps: Double)

  def runAt(cpus: Int, nDocs: Long): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      // ids are the generation index (a pure function of the data row)
      val indexed = spark.range(0, nDocs)
        .map(i => (i, CorpusGen.genDoc(42L, i).content))
        .toDF("doc_id", "content")

      val root = s"${sys.props("java.io.tmpdir")}/graft-scale-$cpus-$nDocs"
      deleteRec(new java.io.File(root))
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, indexed, root)
      val buildSec = (System.nanoTime() - t0) / 1e9

      val searcher = new Searcher(spark, root)
      val queries = CorpusGen.querySet(50)
      val t1 = System.nanoTime()
      val rows = searcher.searchMany(queries, 10).collect()
      val batchSec = (System.nanoTime() - t1) / 1e9
      require(rows.nonEmpty)
      deleteRec(new java.io.File(root))
      RunResult(cpus, buildSec, nDocs / buildSec, batchSec, 50.0 / batchSec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 20000L
    val lo = runAt(8, nDocs)
    val hi = runAt(32, nDocs)
    val eff = hi.buildFps / (4.0 * lo.buildFps)
    val effQ = hi.qps / (4.0 * lo.qps)
    println(
      s"""{"metric":"scaling_efficiency","n_docs":$nDocs,""" +
        s""""build_files_per_sec_8":${lo.buildFps},"build_files_per_sec_32":${hi.buildFps},""" +
        s""""build_sec_8":${lo.buildSec},"build_sec_32":${hi.buildSec},""" +
        s""""batch_qps_8":${lo.qps},"batch_qps_32":${hi.qps},""" +
        s""""build_efficiency_n_to_4n":$eff,"query_efficiency_n_to_4n":$effQ}""")
  }
}
