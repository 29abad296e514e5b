package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * as opaque BINARY columns with typed metadata, and batched feature
  * extraction over `mapPartitions`.
  *
  * The DECODE step is a clearly-marked deterministic STUB — image/audio
  * codec libraries are not in this container. Everything Spark-side is
  * real and tested: the schema, the binary column, the partition-batched
  * UDF shape (decode cost amortized per partition, not per row), and the
  * feature vector contract (fixed length, array<float>), so a real codec
  * drops in by replacing [[decodeStub]] only.
  */
object Multimodal {

  final val FeatureDim = 16

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      format: String, // fake codec tag
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      features: Array[Float])

  /** Deterministic synthetic media table derived from the documents table
    * (payload = UTF-8 bytes of the text, metadata from doc fields) — at
    * 100 TB this column would be real image bytes; the plumbing is
    * identical.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .map { case (id, lang, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, s"fake-$lang", (nChars % 640).toInt, (nChars % 480).toInt,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** STUB decoder ??? — stands in for libjpeg/ffmpeg/soundfile: a
    * deterministic byte-histogram "embedding" so the pipeline shape
    * (bytes → fixed-dim float features) is real and testable. Replace
    * with a real codec binding in production.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < FeatureDim) { hist(j) /= n; j += 1 }
    hist
  }

  /** Batched feature extraction: one `mapPartitions` pass, decode setup
    * amortized per partition (the Scala rendering of the mapInPandas
    * batch shape). Output is a fixed-schema Dataset ready for the
    * similarity operators.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (real codecs are costly
      // to construct — never per row)
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, decodeStub(m.payload))
      }
    }
  }

  /** Frame-sampling analog: deterministic every-nth-byte slices of the
    * payload (a video decoder would emit frames; the partitioning and
    * explode shape are what matter here).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(stride).zipWithIndex.take(4).map { case (chunk, i) =>
        (m.media_id, i, chunk.length, decodeStub(chunk))
      }
    }.toDF("media_id", "frame_no", "frame_bytes", "frame_features")
  }

  /** Frame-level byte-bucket histogram with INTEGER counts — the
    * driver-oracle-able twin of [[sampleFrames]] + [[decodeStub]]: the
    * same stride slicing, frame cap, and byte→bucket mapping, but emitted
    * as raw counts (not the normalized floats) so the DuckDB twin — which
    * decomposes the BLOB byte-by-byte via `hex()` — is value-exact. This
    * upgrades the multimodal gate from "byte lengths round-trip"
    * ([[byteStats]]) to "the decode/feature pipeline itself is verified".
    * Bounded to `maxMedia` payloads: the oracle's per-byte unnest is
    * O(media × stride × frames), a fixed probe regardless of corpus size
    * (the full-corpus path stays [[extractFeatures]]/[[sampleFrames]]).
    */
  def frameHist(spark: SparkSession, dir: String, stride: Int = 64,
      maxFrames: Int = 4, maxMedia: Long = 100L): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).filter(_.media_id < maxMedia)
      .flatMap { m =>
        m.payload.grouped(stride).take(maxFrames).zipWithIndex.flatMap {
          case (chunk, f) =>
            val hist = new Array[Long](FeatureDim)
            chunk.foreach(b => hist((b & 0xff) % FeatureDim) += 1L)
            (0 until FeatureDim).map(j => (m.media_id, f, j, hist(j)))
        }
      }.toDF("media_id", "frame_no", "bucket", "cnt")
      .orderBy("media_id", "frame_no", "bucket")
  }

  def frameHistSql(stride: Int = 64, maxFrames: Int = 4, maxMedia: Long = 100L): String = {
    val maxBytes = stride * maxFrames
    s"""WITH d AS (SELECT doc_id AS media_id, encode(text) AS payload
       |           FROM documents WHERE doc_id < $maxMedia),
       |b AS (SELECT media_id,
       |             unnest(range(1, least(octet_length(payload), $maxBytes) + 1)) AS i,
       |             hex(payload) AS hx FROM d),
       |v AS (SELECT media_id, i,
       |             ('0x' || substr(hx, CAST((i-1)*2+1 AS INT), 2))::BIGINT AS byte FROM b),
       |f AS (SELECT media_id, CAST((i-1) // $stride AS INT) AS frame_no,
       |             CAST(byte % $FeatureDim AS INT) AS bucket FROM v),
       |cnt AS (SELECT media_id, frame_no, bucket, count(*) AS c FROM f GROUP BY 1,2,3),
       |frames AS (SELECT DISTINCT media_id, frame_no FROM f),
       |grid AS (SELECT media_id, frame_no,
       |                CAST(unnest(range(0, $FeatureDim)) AS INT) AS bucket FROM frames)
       |SELECT g.media_id, g.frame_no, g.bucket, CAST(coalesce(c.c, 0) AS BIGINT) AS cnt
       |FROM grid g LEFT JOIN cnt c USING (media_id, frame_no, bucket)
       |ORDER BY media_id, frame_no, bucket""".stripMargin
  }

  /** Driver-checkable summary (SQL-expressible): payload byte lengths per
    * media kind — proves the binary column plumbing end-to-end.
    */
  def byteStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("byte_len")).as("total_bytes"))
      .orderBy(col("kind"))
  }

  val byteStatsSql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  count(*) AS n,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin
}
