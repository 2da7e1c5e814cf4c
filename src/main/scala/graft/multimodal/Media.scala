package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed metadata for an opaque media payload. */
case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int)

/** A multimodal row: payloads stay opaque `Array[Byte]` (Spark BINARY) —
  * never decoded during shuffles; only fixed-width features leave the
  * executor-side decode step. */
case class MediaRecord(id: Long, meta: MediaMeta, payload: Array[Byte])

/** Fixed-width extracted features (small, shuffle-friendly). */
case class MediaFeatures(id: Long, kind: String, nBytes: Long,
                         meanByte: Double, thumb: Array[Float])

/** Multimodal column plumbing for LLM data pipelines.
  *
  * The real decode step (JPEG/PNG/audio codecs) is STUBBED — the image and
  * audio libraries are not in this container — with a deterministic fake
  * (`decodeStub`) so the Spark-side contract is fully real and testable:
  * binary columns, per-partition batch iteration (`mapPartitions`, one
  * decoder instantiation per partition, not per row), typed metadata, and
  * fixed-width feature vectors out.
  *
  * Scale notes: payload bytes flow scan→features within one stage (no
  * shuffle of binaries); `features` output is a narrow Dataset that joins
  * or aggregates cheaply. At 100 TB keep payloads in their own parquet
  * column chunk (they are here) so feature-only queries never read them.
  */
object Media {

  /** Deterministic synthetic payload — stands in for real media bytes. */
  def syntheticPayload(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = id * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  /** A synthetic media table of `n` rows (images / audio alternating). */
  def synthetic(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val isImage = id % 2 == 0
      val meta = if (isImage) MediaMeta("image", 64, 48, 0)
                 else MediaMeta("audio", 0, 0, 16000)
      MediaRecord(id, meta, syntheticPayload(id, 256 + (id % 7).toInt * 64))
    }
  }

  /** STUB decode — a real build would call an image/audio codec here
    * (`???` boundary). Deterministic fake: bytes → floats in [0,1). */
  def decodeStub(payload: Array[Byte]): Array[Float] =
    payload.map(b => ((b & 0xff) / 256.0f))

  /** Nearest-neighbor resample to a fixed-width vector ("thumbnail" /
    * frame sample): the shape every downstream embedding step expects. */
  def resample(px: Array[Float], outLen: Int): Array[Float] =
    Array.tabulate(outLen)(i => px(((i.toLong * px.length) / outLen).toInt))

  /** Per-partition batched decode + feature extraction. The decoder
    * "session" is created once per partition (the `it => ...` prologue),
    * mirroring how a real codec context would be reused across a batch. */
  def features(ds: Dataset[MediaRecord], thumbLen: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec context, buffers)
      it.map { r =>
        val px = decodeStub(r.payload)
        var sum = 0.0
        var i = 0
        while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.id, r.meta.kind, r.payload.length.toLong,
          sum / r.payload.length, resample(px, thumbLen))
      }
    }
  }
}
