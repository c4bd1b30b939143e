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

  /** Feature vectors flow into the similarity stack: near-duplicate media
    * pairs (cosine ≥ 0.999) over the (stub) byte-histogram features —
    * demonstrates binary → features → ANN composition.
    *
    * Candidate generation is signature-bucketed, never all-pairs: each
    * vector gets [[NearDupBands]] independent random-hyperplane
    * signatures (seeded, codegen'd — the `knn_lsh` kernel), pairs are
    * candidates when ANY band collides within hamming distance 1
    * (hamming-1 multiprobe on the probe side). At cos ≥ 0.999 the
    * per-bit collision probability is 1 − θ/π ≥ 0.9857, so a true pair
    * escapes all 4 multiprobed 8-bit bands with probability < 1e-9 —
    * and candidate generation is an EQUI-join on (band, sig): linear
    * shuffle, quadratic only within a bucket, the same scale shape as
    * `dedup_minhash`. Exact cosine is then scored on candidates only. */
  val NearDupBands = 4
  val NearDupBits = 8
  val NearDupThreshold = 0.999

  def mediaNearestPair(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{ArrayKernelColumns, SigKernelColumns}
    val feats = decodeAll(mediaTable(spark, dir))
      .select(col("doc_id"),
        expr("transform(features, x -> cast(x as double))").as("v"))
      .withColumn("n", sqrt(ArrayKernelColumns.array_dot(col("v"), col("v"))))
    val sigs = feats.select(col("doc_id"), explode(array(
        (0 until NearDupBands).map(b => struct(lit(b).as("band"),
          SigKernelColumns.hyperplane_sig(col("v"), NearDupBits, 1000L + b)
            .as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val probes = sigs.select(col("doc_id").as("a"), col("band").as("pband"),
      explode(concat(array(col("sig")), expr(
        s"transform(sequence(0, ${NearDupBits - 1}), j -> cast(sig as bigint) ^ shiftleft(1L, j))")))
        .as("probe_sig"))
    val pairs = sigs.join(probes,
        col("band") === col("pband") && col("sig") === col("probe_sig") &&
        col("a") < col("doc_id"))
      .select(col("a"), col("doc_id").as("b")).distinct()
    pairs
      .join(feats.select(col("doc_id").as("a"), col("v").as("va"), col("n").as("na")), "a")
      .join(feats.select(col("doc_id").as("b"), col("v").as("vb"), col("n").as("nb")), "b")
      .withColumn("cos", round(
        ArrayKernelColumns.array_dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= NearDupThreshold)
      .select(col("a"), col("b"), col("cos"))
      .orderBy("a", "b")
      .limit(100)
  }

  /** Frame sampling: emit every 4th 16-byte "frame" per blob with its
    * byte stats — the video frame-sample shape (decode only sampled
    * frames; here the stub's frame = 16-byte block, so the whole path is
    * byte arithmetic an oracle can replicate). flatMap keeps it a narrow
    * transformation: blobs never shuffle, only sampled frame stats. */
  val FrameStride = 4

  def mediaFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).flatMap { b =>
      val frames = (b.media.length + 15) / 16
      Iterator.range(0, frames, FrameStride).map { f =>
        val start = f * 16
        val end = math.min(start + 16, b.media.length)
        var s = 0L
        var i = start
        while (i < end) { s += b.media(i) & 0xff; i += 1 }
        (b.doc_id, f, end - start, s)
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "frame_sum")
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize: decimate each blob to every 4th byte (the thumbnail /
    * downsample shape) and report the resized length + checksum. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).map { b =>
      var s = 0L
      var n = 0L
      var i = 0
      while (i < b.media.length) { s += b.media(i) & 0xff; n += 1; i += FrameStride }
      (b.doc_id, n, s % 1000000007L)
    }.toDF("doc_id", "resized_bytes", "resized_checksum")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> mediaFeatures _,
    "media_nearest_pair" -> mediaNearestPair _,
    "media_frame_sample" -> mediaFrameSample _,
    "media_resize" -> mediaResize _)

  val oracles: Map[String, String] = Map(
    "media_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(list_sum(list_transform(range(1, length(text) + 1),
        |              i -> ord(substr(text, CAST(i AS INTEGER), 1)))) % 1000000007 AS BIGINT) AS checksum,
        |       CAST((octet_length(CAST(text AS BLOB)) + 15) // 16 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |         unnest(list_transform(
        |           range(0, CAST((length(text) + 15) // 16 AS BIGINT)),
        |           i -> i)) AS frame_idx
        |  FROM documents)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |       CAST(length(substr(text, CAST(frame_idx * 16 + 1 AS INTEGER), 16)) AS INTEGER)
        |         AS frame_bytes,
        |       CAST(list_sum(list_transform(
        |         range(frame_idx * 16 + 1,
        |               CAST(LEAST(frame_idx * 16 + 16, length(text)) + 1 AS BIGINT)),
        |         j -> ord(substr(text, CAST(j AS INTEGER), 1)))) AS BIGINT) AS frame_sum
        |FROM f WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "media_resize" ->
      """SELECT doc_id,
        |       CAST((length(text) + 3) // 4 AS BIGINT) AS resized_bytes,
        |       CAST(list_sum(list_transform(
        |         range(CAST(1 AS BIGINT), CAST(length(text) + 1 AS BIGINT), CAST(4 AS BIGINT)),
        |         j -> ord(substr(text, CAST(j AS INTEGER), 1)))) % 1000000007 AS BIGINT)
        |         AS resized_checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Brute-force replay: the LSH-bucketed candidates + exact rescore
    // are spec-pinned equal to all-pairs cosine (MediaSpec), so the
    // oracle computes all pairs directly. Features replicate the stub's
    // FLOAT32 arithmetic (histogram/total in REAL) before the DOUBLE
    // cosine, so both engines round the same quantized values.
    "media_nearest_pair" ->
      """WITH b AS (
        |  SELECT doc_id, length(text) AS n,
        |         list_transform(range(1, length(text) + 1),
        |           i -> ord(substr(text, CAST(i AS INTEGER), 1)) // 16) AS buckets
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         list_transform(range(0, 16), k ->
        |           CAST(CAST(len(list_filter(buckets, x -> x = k)) AS REAL) /
        |                CAST(GREATEST(n, 1) AS REAL) AS REAL)) AS v
        |  FROM b),
        |nv AS (
        |  SELECT doc_id, v,
        |         sqrt(list_sum(list_transform(v,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM h),
        |p AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b,
        |         round(list_sum(list_transform(range(0, 16), k ->
        |             CAST(x.v[CAST(k + 1 AS INTEGER)] AS DOUBLE) *
        |             CAST(y.v[CAST(k + 1 AS INTEGER)] AS DOUBLE)))
        |           / (x.nrm * y.nrm), 6) AS cos
        |  FROM nv x JOIN nv y ON x.doc_id < y.doc_id)
        |SELECT a, b, cos FROM p WHERE cos >= 0.999
        |ORDER BY a, b LIMIT 100""".stripMargin)
}
