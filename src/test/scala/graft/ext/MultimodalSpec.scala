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

  test("frameSample emits framesPer rows per asset with monotone offsets") {
    val assets = Multimodal.toAssets(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(assets, framesPer = 4)
      .as[(Long, Int, Long)].collect().toSeq
    assert(frames.count(_._1 == 1L) == 4)
    val offsets = frames.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(offsets == offsets.sorted && offsets.head == 0L)
  }
}
