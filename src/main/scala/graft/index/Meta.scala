package graft.index

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Plain-file metadata I/O for the index (Iceberg keeps table metadata in
  * JSON files, not data-format scans — same here): stats as a properties
  * file, the manifest as JSONL. Driver-side microseconds instead of a
  * Spark job per read/write.
  */
object Meta {

  def writeStats(root: String, s: IndexStats): Unit = {
    val text =
      s"""nDocs=${s.nDocs}
         |totalTokens=${s.totalTokens}
         |nTerms=${s.nTerms}
         |totalPostings=${s.totalPostings}
         |bucketSize=${s.bucketSize}
         |nBuckets=${s.nBuckets}
         |""".stripMargin
    Files.writeString(Paths.get(root, "stats.properties"), text)
  }

  def readStats(root: String): IndexStats = {
    val kv = Files.readString(Paths.get(root, "stats.properties"))
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); (k, v) }
      .toMap
    IndexStats(kv("nDocs").toLong, kv("totalTokens").toLong, kv("nTerms").toLong,
      kv("totalPostings").toLong, kv("bucketSize").toLong, kv("nBuckets").toInt)
  }

  def appendManifest(root: String, rows: Seq[ManifestRow]): Unit = {
    val sb = new StringBuilder
    rows.foreach { m =>
      sb.append(s"""{"snapshotId":${m.snapshotId},"stage":"${m.stage}","partitionId":${m.partitionId},""" +
        s""""path":"${m.path}","rows":${m.rows},"elapsedMs":${m.elapsedMs},"status":"${m.status}"}""").append('\n')
    }
    Files.writeString(Paths.get(root, "manifest.jsonl"), sb.toString,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def readManifest(root: String): Seq[ManifestRow] = {
    val p = Paths.get(root, "manifest.jsonl")
    if (!Files.exists(p)) Seq.empty
    else Files.readString(p).linesIterator.filter(_.nonEmpty).map { l =>
      def str(k: String) = s""""$k":"([^"]*)"""".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("")
      def num(k: String) = s""""$k":(-?\\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong).getOrElse(0L)
      ManifestRow(num("snapshotId"), str("stage"), num("partitionId").toInt,
        str("path"), num("rows"), num("elapsedMs"), str("status"))
    }.toSeq
  }
}
