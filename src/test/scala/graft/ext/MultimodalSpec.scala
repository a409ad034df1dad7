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
}
