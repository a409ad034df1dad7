package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "a much longer document body here"))
    .toDF("doc_id", "text")

  test("decodeStub (mapPartitions) agrees with its pure-SQL twin") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text")
    val typed = Multimodal.decodeStub(assets)
      .collect().map(m => (m.asset_id, m.n_bytes, m.width, m.height)).toSet
    val sql = Multimodal.decodeMetaSql(assets)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(typed == sql)
    assert(typed.size == 2)
  }

  test("parseWav round-trips the builder and survives interposed chunks") {
    val wav = Multimodal.wavBytes(sampleRate = 44100, channels = 2,
      bitsPerSample = 16, nFrames = 1000)
    assert(Multimodal.parseWav(wav).contains(
      Multimodal.WavMeta(44100, 2, 16, 1000L)))
    // splice a LIST chunk between 'fmt ' and 'data' — parsers must walk,
    // not assume fixed offsets
    val listChunk = "LIST".getBytes ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes
    val spliced = wav.take(36) ++ listChunk ++ wav.drop(36)
    assert(Multimodal.parseWav(spliced).contains(
      Multimodal.WavMeta(44100, 2, 16, 1000L)))
    // malformed inputs refuse, not throw
    assert(Multimodal.parseWav(wav.take(10)).isEmpty)
    assert(Multimodal.parseWav("RIFFxxxxJUNK".getBytes).isEmpty)
    // a crafted u32 chunk size >= 2^31 once truncated to a negative Int
    // step and hung the walk forever; must return None, promptly
    val evil = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ Array[Byte](-8, -1, -1, -1) // sz = 0xFFFFFFF8
    assert(Multimodal.parseWav(evil).isEmpty)
    // size merely larger than the remaining payload (no overflow) also refuses
    val oversize = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ Array[Byte](100, 0, 0, 0) ++ "ab".getBytes
    assert(Multimodal.parseWav(oversize).isEmpty)
  }

  test("parsePng reads IHDR; malformed signatures and truncations refuse") {
    val png = Multimodal.pngBytes(640, 480, bitDepth = 8, colorType = 6)
    assert(Multimodal.parsePng(png).contains(Multimodal.PngMeta(640, 480, 8, 6)))
    assert(Multimodal.parsePng(png.take(20)).isEmpty) // truncated IHDR
    assert(Multimodal.parsePng("notapng!".getBytes ++ png.drop(8)).isEmpty)
    // zero dimensions are invalid per spec
    assert(Multimodal.parsePng(Multimodal.pngBytes(0, 480)).isEmpty)
  }

  test("parseJpeg walks marker segments to SOF0; crafted lengths refuse promptly") {
    val jpg = Multimodal.jpegBytes(1920, 1080, components = 3)
    assert(Multimodal.parseJpeg(jpg).contains(Multimodal.JpegMeta(1920, 1080, 3)))
    // grayscale single-component
    assert(Multimodal.parseJpeg(Multimodal.jpegBytes(8, 8, components = 1))
      .contains(Multimodal.JpegMeta(8, 8, 1)))
    assert(Multimodal.parseJpeg(jpg.take(3)).isEmpty)
    assert(Multimodal.parseJpeg("JFIF".getBytes).isEmpty)
    // a segment length of 0 or 1 cannot advance the walk — must refuse,
    // not loop (same discipline as the WAV chunk guard)
    val evil = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x01, 0x00).map(_.toByte)
    assert(Multimodal.parseJpeg(evil).isEmpty)
    // SOS before any SOF: no frame header to report
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0).map(_.toByte)
    assert(Multimodal.parseJpeg(sosFirst).isEmpty)
  }

  test("parseBmp reads dimensions, reports top-down height as magnitude") {
    val bmp = Multimodal.bmpBytes(width = 33, height = 17)
    assert(Multimodal.parseBmp(bmp).contains(Multimodal.BmpMeta(33, 17, 24)))
    // negative (top-down) height: flip the height field's sign bytes
    val buf = java.nio.ByteBuffer.wrap(bmp.clone())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -17)
    assert(Multimodal.parseBmp(buf.array()).contains(Multimodal.BmpMeta(33, 17, 24)))
    assert(Multimodal.parseBmp("notabmp".getBytes).isEmpty)
  }

  test("frameSample emits framesPer rows per asset with monotone offsets") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(assets, framesPer = 4)
      .as[(Long, Int, Long)].collect().toSeq
    assert(frames.count(_._1 == 1L) == 4)
    val offsets = frames.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(offsets == offsets.sorted && offsets.head == 0L)
  }

  test("parseGif round-trips the builder; bad signatures and zero dims refuse") {
    assert(Multimodal.parseGif(Multimodal.gifBytes(320, 200, 16))
      .contains(Multimodal.GifMeta(320, 200, 16)))
    assert(Multimodal.parseGif(Multimodal.gifBytes(1, 1))
      .contains(Multimodal.GifMeta(1, 1, 0)))
    // GIF87a also accepted
    val g87 = Multimodal.gifBytes(40, 30, 4)
    g87(4) = '7'.toByte
    assert(Multimodal.parseGif(g87).contains(Multimodal.GifMeta(40, 30, 4)))
    assert(Multimodal.parseGif("GIF89a".getBytes).isEmpty) // truncated LSD
    assert(Multimodal.parseGif("NOTGIFxxxxxxx".getBytes).isEmpty)
    val zero = Multimodal.gifBytes(5, 5)
    zero(6) = 0; zero(7) = 0
    assert(Multimodal.parseGif(zero).isEmpty)
    intercept[IllegalArgumentException] { Multimodal.gifBytes(10, 10, 3) }
    // u16 bounds fail FAST — pre-round-8 these silently truncated through
    // toShort and built fixtures with a different geometry
    intercept[IllegalArgumentException] { Multimodal.gifBytes(0x10000, 10) }
    intercept[IllegalArgumentException] { Multimodal.gifBytes(10, -1) }
    intercept[IllegalArgumentException] { Multimodal.gifBytes(0, 10) }
  }

  test("parseMp4 walks ftyp/moov/mvhd; crafted box sizes refuse promptly") {
    val m = Multimodal.parseMp4(Multimodal.mp4Bytes(600, 9000)).get
    assert(m == Multimodal.Mp4Meta("isom", 600L, 9000L))
    assert(Multimodal.parseMp4(Multimodal.mp4Bytes(1000, 0, "mp42"))
      .contains(Multimodal.Mp4Meta("mp42", 1000L, 0L)))
    // mvhd version 1 (64-bit times) parses too
    val v1 = Multimodal.mp4Bytes(600, 0)
    // rewrite the mvhd as version 1 in place: bump version byte and move
    // timescale/duration to the v1 offsets (test constructs it manually)
    val mvhdOff = 16 + 8 // ftyp(16) + moov header(8)
    v1(mvhdOff + 8) = 1 // version
    val bb = java.nio.ByteBuffer.wrap(v1)
    bb.putInt(mvhdOff + 28, 700)           // timescale at v1 offset
    bb.putInt(mvhdOff + 32, 0)             // duration hi
    bb.putInt(mvhdOff + 36, 1400)          // duration lo
    assert(Multimodal.parseMp4(v1).contains(Multimodal.Mp4Meta("isom", 700L, 1400L)))
    // no moov -> None; no ftyp -> None
    assert(Multimodal.parseMp4(Multimodal.mp4Bytes(600, 1).take(16)).isEmpty)
    assert(Multimodal.parseMp4(Multimodal.mp4Bytes(600, 1).drop(16)).isEmpty)
    // a crafted size that overruns the buffer refuses instead of looping
    val bad = Multimodal.mp4Bytes(600, 1)
    java.nio.ByteBuffer.wrap(bad).putInt(16, Int.MaxValue) // moov size
    assert(Multimodal.parseMp4(bad).isEmpty)
    val tiny = Multimodal.mp4Bytes(600, 1)
    java.nio.ByteBuffer.wrap(tiny).putInt(16, 4) // non-advancing size
    assert(Multimodal.parseMp4(tiny).isEmpty)
    // u32 bounds fail FAST — a negative Int would round-trip the parser's
    // unsigned read as a huge bogus value
    intercept[IllegalArgumentException] { Multimodal.mp4Bytes(0, 1) }
    intercept[IllegalArgumentException] { Multimodal.mp4Bytes(-600, 1) }
    intercept[IllegalArgumentException] { Multimodal.mp4Bytes(600, -1) }
    assert(Multimodal.parseMp4(Array[Byte](1, 2, 3)).isEmpty)
  }
}
