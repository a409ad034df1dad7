package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-asset plumbing: opaque `binary` payload columns with typed
  * metadata, batch-shaped decode, and deterministic frame sampling.
  *
  * The actual media decoders (image/audio/video libraries) are NOT available
  * in this environment, so [[decodeStub]] is a clearly-marked deterministic
  * FAKE decode — it derives plausible metadata purely from the bytes. What is
  * real and load-bearing for a 100 TB pipeline is everything around it:
  * the binary-column schema, the `mapPartitions` batch shape (one decoder
  * init per partition, streamed rows — the Scala analogue of `mapInPandas`
  * batches), and the explode-based frame sampling plan.
  */
object Multimodal {

  /** Typed metadata a real decoder would emit. */
  final case class AssetMeta(asset_id: Long, n_bytes: Long, width: Int, height: Int)

  /** Wrap a text corpus as opaque binary assets (UTF-8 payload stand-in for
    * image bytes): (asset_id, payload: binary, kind).
    */
  def toAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("image/fake").as("kind"))

  /** STUB DECODE — deterministic fake: width/height derived from the byte
    * length. A real implementation initializes the decoder once per
    * partition (the expensive part this batch shape exists for) and emits
    * real dimensions. Signature, schema and distribution are the real thing.
    */
  def decodeStub(assets: DataFrame): Dataset[AssetMeta] = {
    import assets.sparkSession.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real decoder init would happen HERE, once per partition
        rows.map { case (id, bytes) =>
          val n = bytes.length.toLong
          AssetMeta(id, n, (320 + n % 320).toInt, (240 + n % 240).toInt)
        }
      }
  }

  /** Pure-SQL twin of [[decodeStub]] (no lambda, fully codegen'd) — used by
    * the oracle-checked query so the stub's arithmetic is verifiable.
    */
  def decodeMetaSql(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      (lit(320) + octet_length(col("payload")) % 320).cast("int").as("width"),
      (lit(240) + octet_length(col("payload")) % 240).cast("int").as("height"))

  /** Deterministic frame sampling: emit `framesPer` (frame_no, frame_offset)
    * rows per asset — the plan shape of video frame extraction (generator →
    * per-frame rows ready for a decode stage), with byte offsets spread
    * evenly through the payload.
    */
  def frameSample(assets: DataFrame, framesPer: Int): DataFrame =
    assets.select(col("asset_id"), octet_length(col("payload")).as("len"),
        posexplode(sequence(lit(0), lit(framesPer - 1))))
      .select(
        col("asset_id"),
        col("pos").cast("int").as("frame_no"),
        (col("col") * col("len") / framesPer).cast("long").as("frame_offset"))
}
