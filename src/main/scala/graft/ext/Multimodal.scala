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

  // ------------------------------------------------------------------
  // REAL container parsing — WAV (RIFF) and BMP headers are plain byte
  // layouts needing no media library, so unlike the sample-level decode
  // stub these run genuinely executor-side over binary columns. Sample
  // decoding beyond the header still requires codecs this environment
  // lacks; metadata extraction is the part of a 100 TB media-ingest
  // pipeline that gates partitioning/filtering decisions anyway.
  // ------------------------------------------------------------------

  final case class WavMeta(sample_rate: Int, channels: Int,
                           bits_per_sample: Int, n_frames: Long)
  final case class BmpMeta(width: Int, height: Int, bits_per_pixel: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE header: walks chunks (tolerating LIST/fact/etc.
    * between `fmt ` and `data`), returns None for anything malformed.
    */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = u32le(bytes, off + 4)
      if (id == "fmt " && off + 8 + 16 <= bytes.length) {
        fmt = Some((u16le(bytes, off + 10), u32le(bytes, off + 12).toInt,
          u16le(bytes, off + 22), u16le(bytes, off + 20)))
      } else if (id == "data") {
        return fmt.collect {
          case (ch, rate, bits, block) if block > 0 =>
            WavMeta(rate, ch, bits, sz / block)
        }
      }
      // sz is an unvalidated u32: a crafted size >= 2^31 truncates to a
      // negative Int step and the walk never advances (executor-side
      // infinite loop). A non-data chunk's payload must lie inside the
      // blob for the walk to make sense — reject anything that doesn't.
      if (sz > bytes.length - off - 8) return None
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** Parse a BMP (BITMAPINFOHEADER) header; height may be negative
    * (top-down rows) — reported as its magnitude.
    */
  def parseBmp(bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes.length < 30 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val w = u32le(bytes, 18).toInt
    val h = u32le(bytes, 22).toInt
    Some(BmpMeta(w, math.abs(h), u16le(bytes, 28)))
  }

  final case class PngMeta(width: Int, height: Int, bit_depth: Int, color_type: Int)
  final case class JpegMeta(width: Int, height: Int, components: Int)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Parse a PNG header: 8-byte signature, then the IHDR chunk (the spec
    * REQUIRES IHDR first, so this is a fixed-offset read after validating
    * the chunk type). None for anything malformed.
    */
  def parsePng(bytes: Array[Byte]): Option[PngMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 26 || !bytes.take(8).sameElements(sig)) return None
    if (tag(bytes, 12) != "IHDR") return None
    val w = u32be(bytes, 16); val h = u32be(bytes, 20)
    // spec caps dimensions at 2^31-1; 0 is invalid
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) return None
    Some(PngMeta(w.toInt, h.toInt, bytes(24) & 0xff, bytes(25) & 0xff))
  }

  /** Parse a JPEG (JFIF/EXIF) header by walking marker segments to the
    * first SOFn frame header (which carries height/width/components).
    * Standalone markers (RSTn/TEM) have no length field; every other
    * segment's 2-byte big-endian length includes itself. Oversized or
    * non-advancing lengths refuse (same discipline as the WAV walk — a
    * crafted length must not hang an executor). None for anything
    * malformed or truncated before a frame header.
    */
  def parseJpeg(bytes: Array[Byte]): Option[JpegMeta] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var off = 2
    while (off + 4 <= bytes.length) {
      if ((bytes(off) & 0xff) != 0xff) return None
      var marker = bytes(off + 1) & 0xff
      // fill bytes: FF can pad before a marker
      while (marker == 0xff && off + 2 < bytes.length) { off += 1; marker = bytes(off + 1) & 0xff }
      marker match {
        case m if (m >= 0xd0 && m <= 0xd9) || m == 0x01 => // standalone
          off += 2
        case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn: [len][precision][height][width][ncomponents]
          if (off + 10 > bytes.length) return None
          val h = u16be(bytes, off + 5); val w = u16be(bytes, off + 7)
          if (w < 1 || h < 1) return None
          return Some(JpegMeta(w, h, bytes(off + 9) & 0xff))
        case 0xda => return None // SOS before any SOF: no frame header
        case _ =>
          val len = u16be(bytes, off + 2)
          if (len < 2 || off + 2 + len > bytes.length) return None // non-advancing / truncated
          off += 2 + len
      }
    }
    None
  }

  /** Build a valid 16-bit PCM WAV byte blob (silent payload) — the
    * deterministic fixture generator for specs and the src08 round-trip.
    */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
               nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    buf.put("data".getBytes).putInt(dataSize)
    buf.array()
  }

  /** Build a minimal valid PNG byte blob (IHDR + empty IEND; CRCs zeroed —
    * the header parser does not verify them, real decoders would).
    */
  def pngBytes(width: Int, height: Int, bitDepth: Int = 8,
               colorType: Int = 6): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 25 + 12) // sig + IHDR + IEND
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    buf.putInt(13).put("IHDR".getBytes)
      .putInt(width).putInt(height)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .putInt(0) // CRC (unchecked)
    buf.putInt(0).put("IEND".getBytes).putInt(0)
    buf.array()
  }

  /** Build a minimal valid JPEG byte blob (SOI + APP0 + SOF0 + EOI). */
  def jpegBytes(width: Int, height: Int, components: Int = 3): Array[Byte] = {
    val sofLen = 8 + 3 * components
    val buf = java.nio.ByteBuffer.allocate(2 + 18 + 2 + sofLen + 2)
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0
      .put("JFIF".getBytes).put(0.toByte)
      .put(1.toByte).put(1.toByte).put(0.toByte)
      .putShort(72.toShort).putShort(72.toShort).put(0.toByte).put(0.toByte)
    buf.put(0xff.toByte).put(0xc0.toByte).putShort(sofLen.toShort) // SOF0
      .put(8.toByte).putShort(height.toShort).putShort(width.toShort)
      .put(components.toByte)
    (1 to components).foreach { c =>
      buf.put(c.toByte).put(0x11.toByte).put(0.toByte)
    }
    buf.put(0xff.toByte).put(0xd9.toByte) // EOI
    buf.array()
  }

  /** Build a valid 24-bit BMP byte blob (zeroed pixels, 4-byte row pad). */
  def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((24 * width + 31) / 32) * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    buf.array()
  }

  final case class GifMeta(width: Int, height: Int, gct_colors: Int)

  /** Parse a GIF87a/GIF89a header + logical screen descriptor. The global
    * color table size is decoded from the packed byte (2^(n+1) colors when
    * the GCT flag is set, 0 otherwise). None for anything malformed.
    */
  def parseGif(bytes: Array[Byte]): Option[GifMeta] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF89a" && sig != "GIF87a") return None
    val w = u16le(bytes, 6); val h = u16le(bytes, 8)
    if (w < 1 || h < 1) return None
    val packed = bytes(10) & 0xff
    val gct = if ((packed & 0x80) != 0) 1 << ((packed & 0x07) + 1) else 0
    Some(GifMeta(w, h, gct))
  }

  /** Build a minimal valid GIF89a blob (LSD + trailer, no image data —
    * header-level fixture, same spirit as the other builders).
    */
  def gifBytes(width: Int, height: Int, gctColors: Int = 0): Array[Byte] = {
    // the LSD stores u16 dims — an out-of-range value would silently
    // truncate through toShort and build a fixture that parses as a
    // DIFFERENT geometry; fail fast instead
    require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
      s"GIF dims must be in [1, 65535], got ${width}x$height")
    require(gctColors == 0 || (gctColors >= 2 && gctColors <= 256 &&
      Integer.bitCount(gctColors) == 1), s"gct must be 0 or a power of two in [2,256]")
    val gctBytes = gctColors * 3
    val buf = java.nio.ByteBuffer.allocate(13 + gctBytes + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putShort(width.toShort).putShort(height.toShort)
    val packed = if (gctColors == 0) 0
                 else 0x80 | (31 - Integer.numberOfLeadingZeros(gctColors) - 1)
    buf.put(packed.toByte).put(0.toByte).put(0.toByte)
    buf.position(buf.position() + gctBytes) // zeroed palette
    buf.put(0x3b.toByte)                    // trailer
    buf.array()
  }

  final case class Mp4Meta(brand: String, timescale: Long, duration: Long)

  /** Parse an ISO-BMFF (MP4/MOV) header: walk the top-level boxes for
    * `ftyp` (major brand) and `moov`, then walk moov's children for `mvhd`
    * (movie timescale + duration; version 0 and 1 layouts both handled).
    * Box sizes are validated to advance (same crafted-length discipline as
    * the WAV/JPEG walks — a hostile size field must not hang an executor).
    * None unless both ftyp and mvhd are present and well-formed.
    */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    var brand: Option[String] = None
    var movie: Option[(Long, Long)] = None
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var off = from
      while (off + 8 <= until) {
        val size = u32be(bytes, off)
        val typ = tag(bytes, off + 4)
        // size 1 (64-bit largesize) and 0 (to-EOF) exist in the spec; the
        // header fixtures never need them, so refuse rather than misparse
        if (size < 8 || off + size > until) return
        typ match {
          case "ftyp" if size >= 12 =>
            brand = Some(tag(bytes, off + 8))
          case "moov" if depth == 0 =>
            walk(off + 8, off + size.toInt, depth + 1)
          case "mvhd" if depth == 1 =>
            val v = bytes(off + 8) & 0xff
            if (v == 0 && size >= 32)
              movie = Some((u32be(bytes, off + 20), u32be(bytes, off + 24)))
            else if (v == 1 && size >= 44)
              movie = Some((u32be(bytes, off + 28),
                (u32be(bytes, off + 32) << 32) | u32be(bytes, off + 36)))
          case _ => ()
        }
        off += size.toInt
      }
    }
    if (bytes.length < 12) return None
    walk(0, bytes.length, 0)
    for { b <- brand; (ts, d) <- movie; if ts > 0 } yield Mp4Meta(b, ts, d)
  }

  /** Build a minimal valid MP4 blob: `ftyp` (major brand, no compatible
    * brands) + `moov` containing a version-0 `mvhd` with the given movie
    * timescale/duration. Header-level fixture like the others.
    */
  def mp4Bytes(timescale: Int, duration: Int, brand: String = "isom"): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4cc")
    // mvhd v0 stores u32 fields; a negative Int would round-trip through
    // the parser's unsigned read as a huge bogus value (and parseMp4
    // rejects timescale 0) — bound the fixture to what it claims to build
    require(timescale > 0, s"timescale must be positive, got $timescale")
    require(duration >= 0, s"duration must be non-negative, got $duration")
    val buf = java.nio.ByteBuffer.allocate(16 + 116) // ftyp + moov(mvhd)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put(brand.getBytes("US-ASCII")).putInt(0)
    buf.putInt(116).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)                  // version 0 + flags
      .putInt(0).putInt(0)        // creation/modification
      .putInt(timescale).putInt(duration)
      .putInt(0x00010000)         // rate 1.0
      .putShort(0x0100.toShort)   // volume 1.0
      .putShort(0.toShort).putInt(0).putInt(0) // reserved
    (0 until 9).foreach(i => buf.putInt(if (i == 0 || i == 4) 0x00010000
                                        else if (i == 8) 0x40000000 else 0)) // unity matrix
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(2)                // next_track_ID
    buf.array()
  }
}
