package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextAnalysis.mdhash

/** Multimodal-column plumbing (driver contract): treat image/audio/video as
  * opaque `binary` columns with typed metadata, with decode/feature-extract
  * as per-partition batch functions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB ([[decodeImageStub]]) — but everything
  * Spark-side is real and tested: the binary column, the metadata struct
  * schema, the `mapPartitions` batch shape (one decoder instantiation per
  * partition, streamed rows — exactly how a Pandas-UDF/`mapInPandas` decode
  * behaves on a cluster), and the partitioning contract.
  *
  * At 100 TB: media bytes stay in their own column (parquet stores them as
  * separate byte-array pages, so metadata-only queries never read them —
  * column pruning is the whole design), and decode parallelism is partition
  * count × executor cores with no shuffle.
  */
object MultimodalOps {

  /** A multimodal record: opaque bytes + typed metadata. */
  case class MediaRecord(doc_id: Long, bytes: Array[Byte], mime: String, n_bytes: Long)

  /** Decoded features (what an image decoder would emit). */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_channels: Int, mean_luma: Double)

  /** Build the media table: documents' text bytes stand in for media blobs.
    * Real pipeline: `spark.read.format("binaryFile")` or parquet with a
    * binary column.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("bytes"),
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB image decoder — deterministic fake standing in for e.g. libjpeg:
    * derives "dimensions" from a content hash and "luma" from the byte mean.
    * The real implementation would decode `r.bytes` here; the Spark-side
    * contract (mapPartitions batching, one decoder per partition, typed
    * output schema) is identical either way.
    */
  def decodeImageStub(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (a real decoder would allocate its codec here, once)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val hex = md.digest(r.bytes).map("%02x".format(_)).mkString
        val h = new java.math.BigInteger(hex.substring(0, 15), 16).longValue()
        MediaFeatures(
          doc_id = r.doc_id,
          width = (h % 640 + 16).toInt,
          height = (h % 480 + 16).toInt,
          n_channels = 3,
          mean_luma = if (r.bytes.isEmpty) 0.0
                      else r.bytes.map(b => (b & 0xff).toDouble).sum / r.bytes.length)
      }
    }
  }

  /** One sampled "frame" of a media blob. */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
                   n_bytes: Int, frame_hash: String)

  /** STUB frame sampler — the one-to-many decode shape (video → every k-th
    * frame): `flatMap` over the typed Dataset, emitting fixed-size byte
    * windows as "frames" with a content hash. A real implementation seeks
    * keyframes with a codec; the Spark-side contract (typed one-to-many
    * flatMap, per-partition decoder reuse, bounded output per row) is
    * identical.
    */
  def sampleFramesStub(spark: SparkSession, media: Dataset[MediaRecord],
                       frameBytes: Int = 64, everyKth: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val nFrames = math.max(r.bytes.length / frameBytes, 1)
        (0 until nFrames by everyKth).map { i =>
          val off = i * frameBytes
          val slice = r.bytes.slice(off, math.min(off + frameBytes, r.bytes.length))
          Frame(r.doc_id, i, off.toLong, slice.length,
            md.digest(slice).map("%02x".format(_)).mkString.take(16))
        }
      }
    }
  }

  /** Codec-free media-blob near-dup, part 1 of 2: MinHash-LSH over BYTE
    * shingles of the blob column — fixed 16-byte windows at stride 8 over
    * `bytes`, so it needs NO decoder and works on any mime type (a
    * re-encoded JPEG won't match, but re-uploads, partial truncations, and
    * metadata-stripped copies — the bulk of real media dup mass — share
    * long byte runs). Reuses the text pipeline's banding + exact-verify
    * engine ([[DedupOps.lshJaccardOver]]) wholesale: signatures are 64 B
    * per blob, candidates come from the band join (never all-pairs), and
    * the blobs themselves are read once for shingling and never shuffled.
    *
    * The whole pipeline runs on BINARY end to end — window slice, md5,
    * exact-verify equi-join — with no charset decode anywhere (a UTF-8
    * decode would collapse every invalid byte sequence to U+FFFD and
    * alias distinct windows of a real binary blob into equal shingles,
    * inflating the intersection counts; pinned by `MediaDedupSpec`'s
    * invalid-UTF-8 case). The corpus stand-in is ASCII text-as-bytes, so
    * the DuckDB oracle mirrors it with character windows — md5 over the
    * same bytes either way on this data, while the Spark plan is the one
    * a real binary corpus would run.
    */
  def mediaDedup(spark: SparkSession, dir: String,
                 minJaccard: Double = 0.05): DataFrame =
    DedupOps.lshJaccardOver(mediaByteShingles(spark, dir), minJaccard)

  /** Distinct (doc_id, s) byte-window shingles of the media blobs.
    * Positions explode CHEAP (an int sequence), the window slice runs
    * per-row on materialized attributes — the same
    * optimizer-cannot-duplicate discipline as
    * [[DedupOps.explodedShingles]] (inline expensive generators get
    * re-evaluated by InferFiltersFromGenerate).
    */
  private def mediaByteShingles(spark: SparkSession, dir: String,
                                width: Int = 16, stride: Int = 8): DataFrame =
    mediaTable(spark, dir).toDF()
      .filter(col("n_bytes") >= width)
      .select(col("doc_id"), col("bytes"),
        explode(sequence(lit(0),
          ((col("n_bytes") - width) / stride).cast("int"))).as("i"))
      .select(col("doc_id"),
        expr(s"substring(bytes, i * $stride + 1, $width)").as("s"))
      .distinct()

  /** Codec-free media near-dup, part 2 of 2: FRAME-hash overlap over the
    * sampled-frame stream ([[sampleFramesStub]]) — the video analog of
    * shingle containment: two blobs sharing ≥ `minShare` of their sampled
    * frames (by content hash) are near-dups even when their containers
    * differ in length (truncation, re-muxing). Scale shape:
    *
    *  - frames join on `frame_hash` — an equi-join on a 16-char digest,
    *    hash-shuffled, never all-pairs;
    *  - STOP-FRAME removal first: a hash present in more than `maxDf`
    *    blobs (black frames, intro cards) would make the pair join
    *    quadratic in its document frequency — dropped exactly like
    *    stopwords from a postings list, BEFORE the self-join;
    *  - per-doc frame counts are computed on the pruned universe, so the
    *    share denominator matches what the join can actually produce.
    */
  def frameDedup(spark: SparkSession, dir: String,
                 maxDf: Int = 50, minShare: Double = 0.5): DataFrame = {
    val fr = sampleFramesStub(spark, mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("frame_hash")).distinct()
    val rare = fr.groupBy("frame_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("frame_hash")
    // reused three ways (denominator counts + both self-join sides); rows
    // are ~24 B (doc_id, 16-char hash) pairs, but at 100 TB frame counts
    // the set can still outgrow executor memory — MEMORY_AND_DISK spills
    // instead of silently recomputing the prune per consumer
    val pruned = TransientCache(fr.join(rare, Seq("frame_hash"), "left_semi"))
    val nf = pruned.groupBy("doc_id").agg(count(lit(1)).as("n_f"))
    val shared = pruned.as("a").join(pruned.as("b"),
        col("a.frame_hash") === col("b.frame_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(nf.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_f", "n1"), "id1")
      .join(nf.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_f", "n2"), "id2")
      .withColumn("share",
        bround(col("n_shared").cast("double") / least(col("n1"), col("n2")), 6)
          .cast("decimal(10,6)"))
      .filter(col("share") >= minShare)
      .select(col("id1"), col("id2"), col("n_shared"), col("n1"), col("n2"),
        col("share").cast("double").as("share"))
  }

  /** Metadata-only query over the media table (oracle-checkable): schema
    * plumbing + hash-derived fake dimensions, never touching a codec. The
    * parquet scan for this query prunes the bytes column entirely.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_md5"),
        lit("text/plain").as("mime"),
        (mdhash(col("text")) % 640 + 16).as("fake_width"),
        (mdhash(col("text")) % 480 + 16).as("fake_height"))
}
