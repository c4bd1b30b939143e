package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Multimodal-column pipeline: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batch-oriented
  * `mapPartitions` (the Scala analog of mapInPandas — one iterator per
  * partition, amortized per-batch setup such as codec initialization).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below): it parses a fake fixed
  * header and byte statistics instead of pixels. Everything around it —
  * the binary schema, partitioning, batch iterator shape, feature-vector
  * output — is the real Spark plumbing a production decoder would use
  * unchanged (swap `decodeStub` for a JNI/codec call).
  *
  * Scale notes: media blobs never shuffle — decode/extract are
  * narrow transformations; only the small metadata/feature outputs move.
  */
object Media {

  /** Typed media row (binary payload + source id). */
  final case class MediaBlob(doc_id: Long, media: Array[Byte])

  /** Decoded metadata + feature vector. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, checksum: Long, n_frames: Int,
      features: Array[Float])

  /** ===== STUB ===== deterministic fake decoder. A real implementation
    * would parse the container format here (JPEG/FLAC/MP4); the stub
    * derives "width/height/frames" from byte statistics so outputs are
    * reproducible and schema-correct. */
  def decodeStub(blob: Array[Byte]): MediaMeta = {
    var sum = 0L
    val hist = new Array[Int](16)
    var i = 0
    while (i < blob.length) {
      val b = blob(i) & 0xff
      sum += b
      hist(b >>> 4) += 1
      i += 1
    }
    val nFrames = (blob.length + 15) / 16 // "frame" = 16-byte block
    val total = math.max(blob.length, 1).toFloat
    MediaMeta(
      doc_id = -1L, // filled by caller
      n_bytes = blob.length.toLong,
      checksum = sum % 1000000007L,
      n_frames = nFrames,
      features = hist.map(_ / total))
  }

  /** The media table: documents' text re-encoded as binary payloads —
    * the stand-in for an `images`/`audio` table with a `binary` column. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaBlob]
  }

  /** Batch decode via mapPartitions: per-partition iterator (codec setup
    * happens once per partition, not per row — the mapInPandas shape). */
  def decodeAll(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition: real code would open the codec/library here once
      it.map { b => decodeStub(b.media).copy(doc_id = b.doc_id) }
    }
  }

  /** Metadata + frame-sampling query (oracle-checkable: the stub's
    * checksum/frame math is pure byte arithmetic DuckDB can replicate). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeAll(mediaTable(spark, dir))
      .select(col("doc_id"), col("n_bytes"), col("checksum"), col("n_frames"))
      .orderBy("doc_id")
  }

  /** Feature vectors flow into the similarity stack: nearest media pair
    * by cosine over the (stub) byte-histogram features — demonstrates
    * binary → features → ANN composition. */
  def mediaNearestPair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = decodeAll(mediaTable(spark, dir))
      .select(col("doc_id"),
        expr("transform(features, x -> cast(x as double))").as("v"))
      .withColumn("n", sqrt(expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (a, x) -> a + x)")))
    feats.as("x").join(feats.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("cos", round(expr(
        "aggregate(zip_with(x.v, y.v, (p, q) -> p * q), 0D, (a, p) -> a + p)") /
        (col("x.n") * col("y.n")), 6))
      .filter(col("cos") >= 0.999)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), col("cos"))
      .orderBy("a", "b")
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> mediaFeatures _,
    "media_nearest_pair" -> mediaNearestPair _)

  val oracles: Map[String, String] = Map(
    "media_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(list_sum(list_transform(range(1, length(text) + 1),
        |              i -> ord(substr(text, CAST(i AS INTEGER), 1)))) % 1000000007 AS BIGINT) AS checksum,
        |       CAST((octet_length(CAST(text AS BLOB)) + 15) // 16 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)
    // media_nearest_pair: depends on the stub's histogram features →
    // rows-only; MediaSpec pins the kernel and plumbing.
}
