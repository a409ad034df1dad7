package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Contract-checked JSON-Lines source — the interchange format training
  * corpora actually ship in (one JSON document per line; same extract
  * contract discipline as [[CsvSource]], reference `ops/extract.py`
  * required-column/non-empty guards).
  *
  * Schema is explicit, never inferred: at 100 TB a `spark.read.json`
  * without a schema is a full extra inference scan of the corpus before
  * the first real pass. Line mode (the default, `multiLine=false`) is the
  * scale-correct shape — files split by line boundaries so a single
  * 100 GB shard still fans out across tasks; multiLine JSON cannot split
  * and is deliberately not exposed here. Corrupt lines land in
  * `_corrupt_record` when the caller includes it in the schema
  * (PERMISSIVE), or drop under DROPMALFORMED — surfaced as options, not
  * silently chosen.
  */
object JsonlSource {

  /** JSONL scan with an explicit schema + column contract. */
  def read(spark: SparkSession, path: String, schema: StructType,
           required: Seq[String] = Nil, requireRows: Boolean = false,
           mode: String = "PERMISSIVE"): DataFrame = {
    val df = spark.read
      .schema(schema)
      .option("mode", mode)
      .json(path)
    val checked = CsvSource.requireColumns(df, required)
    if (requireRows) CsvSource.requireNonEmpty(checked, s"jsonl $path") else checked
  }
}
