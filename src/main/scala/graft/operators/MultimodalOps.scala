package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `BinaryType` payloads with typed metadata alongside, and per-partition
  * batch decoding for feature extraction.
  *
  * The Spark-side architecture is the real deliverable here: binary columns
  * survive parquet round-trips, partition sizing bounds per-task decode
  * memory, and the decode runs via `mapPartitions` so a codec can amortize
  * init across a whole batch (the JVM analogue of a vectorized Python UDF).
  * The codec itself is STUBBED — no image/audio libraries exist in this
  * environment — with `FakeCodec`, a deterministic stand-in that derives
  * "decoded" dimensions from the payload bytes. Swap `MediaCodec` for a
  * real JNI/Java codec without touching any of the plumbing.
  */
object MultimodalOps {

  /** One decoded media record. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, format: String)

  /** Batch decode interface — implement with a real codec in production. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, String)
  }

  /** STUB: deterministic fake decode — dimensions derived from payload
    * bytes, so tests and oracles can predict outputs exactly. */
  object FakeCodec extends MediaCodec {
    def decode(payload: Array[Byte]): (Int, Int, String) = {
      val first = if (payload.nonEmpty) payload(0) & 0xff else 0
      val width = (first % 64) + 1
      val height = (payload.length % 64).toInt + 1
      (width, height, "fake/v1")
    }
  }

  /** Attach a binary payload column. In a real pipeline the payload IS the
    * stored bytes (parquet binary); here we synthesize one from text so the
    * driver test tables can exercise the path. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Frame sampling over a binary media payload: treat the payload as
    * consecutive `frameLen`-byte frames ("video"), keep every `stride`-th
    * frame, and emit the frame count plus an md5 checksum of the sampled
    * concatenation. A real video pipeline swaps byte-chunking for codec
    * keyframe offsets; the SELECT/no-shuffle shape — decode bound, narrow,
    * codegen'd — is what matters at scale. Payload bytes are treated as
    * UTF-8 text (the driver tables synthesize them from text), keeping the
    * result DuckDB-checkable. */
  def frameSample(payloads: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    val txt = decode(col("payload"), "UTF-8")
    val nFrames = ceil(length(txt).cast("double") / frameLen).cast("long")
    val nSampled = ceil(nFrames.cast("double") / stride).cast("long")
    payloads.select(
      col("doc_id"),
      nFrames.as("n_frames"),
      // greatest(..,0): empty payloads still sample one (empty) frame —
      // sequence(0, -1) would count DOWN, not produce an empty array
      md5(array_join(transform(
        sequence(lit(0), greatest(nSampled - 1, lit(0L)).cast("int")),
        j => txt.substr(lit(1) + j * (frameLen * stride), lit(frameLen))),
        "")).as("sample_md5"))
  }

  /** Windowed audio-energy features over a binary payload (codegen'd
    * WindowEnergy loop, partial final window kept): one row per
    * (doc, window index) — the exploded feature-table shape a downstream
    * trainer consumes. Narrow (generator, no shuffle); empty payloads
    * produce no rows. */
  def audioEnergy(payloads: DataFrame, win: Int): DataFrame =
    payloads
      .select(col("doc_id"), graft.functions.MultimodalExpressions
        .windowEnergy(col("payload"), win).as("__e"))
      // outer + null-filter: plain posexplode would infer a size>0 filter
      // that re-evaluates the energy expression at the scan
      .select(col("doc_id"), posexplode_outer(col("__e")).as(Seq("w", "energy")))
      .where(col("energy").isNotNull)
      .select(col("doc_id"), col("w").cast("long").as("w"), col("energy"))

  /** Decode payloads partition-at-a-time. Returns a typed Dataset; the
    * codec is constructed once per partition, not per row. */
  def decodeMeta(payloads: DataFrame, codec: MediaCodec = FakeCodec)
      : Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup would go here (e.g. native lib init)
        it.map { case (id, payload) =>
          val (w, h, fmt) = codec.decode(payload)
          MediaMeta(id, payload.length.toLong, w, h, fmt)
        }
      }
  }
}
