package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** dBase III (.DBF) reader — SURVEY §2 S6 (reference: dw-etl
  * `raw_analysis/main.py:12-38` `dbf_to_df` via the dbfread package; the
  * format itself is the public dBase spec: 32-byte header, 32-byte field
  * descriptors terminated by 0x0D, then fixed-width records each led by a
  * deletion flag).
  *
  * Scale shape: the HEADER of one file is read driver-side (a few hundred
  * bytes) to fix the schema; record parsing runs executor-side over Spark's
  * `binaryFile` source, one task per file, so a directory of thousands of
  * DBF extracts parallelizes naturally. A single DBF file is not splittable
  * (fixed-width rows but no sync markers mid-file) — same granularity as
  * gzip'd CSV, and DBF files are capped at 2 GB by the format anyway.
  *
  * Type mapping (dbfread parity): C → trimmed string, N/F with 0 decimals →
  * long, with decimals → double, L → boolean ('?' / blank → null),
  * D → DateType (YYYYMMDD). Deleted records (flag 0x2A) are skipped.
  */
object DbfSource {

  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)
  final case class DbfHeader(recordCount: Int, headerSize: Int, recordSize: Int,
                             fields: Seq[DbfField])

  private def u8(b: Byte): Int = b & 0xff
  private def u16le(bytes: Array[Byte], off: Int): Int =
    u8(bytes(off)) | (u8(bytes(off + 1)) << 8)
  private def u32le(bytes: Array[Byte], off: Int): Long =
    (u8(bytes(off)).toLong | (u8(bytes(off + 1)).toLong << 8)
      | (u8(bytes(off + 2)).toLong << 16) | (u8(bytes(off + 3)).toLong << 24))

  /** Walk the fixed-width header: field descriptors start at byte 32, each
    * 32 bytes, until the 0x0D terminator.
    */
  def parseHeader(bytes: Array[Byte]): DbfHeader = {
    require(bytes.length >= 32, s"not a DBF file: ${bytes.length} bytes")
    val recordCount = u32le(bytes, 4).toInt
    val headerSize = u16le(bytes, 8)
    val recordSize = u16le(bytes, 10)
    val fields = Iterator.from(32, 32)
      .takeWhile(off => off + 32 <= bytes.length && bytes(off) != 0x0d)
      .map { off =>
        val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
        DbfField(new String(nameBytes, StandardCharsets.US_ASCII),
          bytes(off + 11).toChar, u8(bytes(off + 16)), u8(bytes(off + 17)))
      }.toVector
    require(fields.nonEmpty, "DBF header has no field descriptors")
    DbfHeader(recordCount, headerSize, recordSize, fields)
  }

  def sparkType(f: DbfField): DataType = f.ftype match {
    case 'C' | 'M'       => StringType
    case 'N' | 'F'       => if (f.decimals == 0) LongType else DoubleType
    case 'L'             => BooleanType
    case 'D'             => DateType
    case other           => throw new IllegalArgumentException(
      s"unsupported DBF field type '$other' (field ${f.name})")
  }

  def schemaFor(hdr: DbfHeader): StructType =
    StructType(hdr.fields.map(f => StructField(f.name, sparkType(f), nullable = true)))

  /** Parse the record section: each record is 1 deletion-flag byte + the
    * fixed-width field values; 0x2A flags a soft-deleted row (skipped, like
    * dbfread's default). Values are space-padded ASCII.
    */
  def parseRecords(bytes: Array[Byte], hdr: DbfHeader): Iterator[Row] = {
    val n = hdr.recordCount
    (0 until n).iterator.flatMap { i =>
      val base = hdr.headerSize + i.toLong * hdr.recordSize
      if (base + hdr.recordSize > bytes.length) None
      else if (bytes(base.toInt) == 0x2a) None // deleted record
      else {
        var off = base.toInt + 1
        val values = hdr.fields.map { f =>
          val raw = new String(bytes, off, f.length, StandardCharsets.ISO_8859_1)
          off += f.length
          decode(f, raw)
        }
        Some(Row.fromSeq(values))
      }
    }
  }

  private def decode(f: DbfField, raw: String): Any = {
    val t = raw.trim
    f.ftype match {
      case 'C' | 'M' => t
      case 'N' | 'F' =>
        if (t.isEmpty || t.forall(_ == '*')) null
        else if (f.decimals == 0) t.toLong
        else t.toDouble
      case 'L' => t match {
        case "T" | "t" | "Y" | "y" => java.lang.Boolean.TRUE
        case "F" | "f" | "N" | "n" => java.lang.Boolean.FALSE
        case _                     => null
      }
      case 'D' =>
        if (t.length != 8) null
        else java.sql.Date.valueOf(
          s"${t.substring(0, 4)}-${t.substring(4, 6)}-${t.substring(6, 8)}")
      case _ => null
    }
  }

  /** Read one DBF file or a directory/glob of same-schema DBF files. The
    * first file's header fixes the schema driver-side; full files are then
    * parsed inside executors from a `binaryFile` scan (one task per file).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // a directly-named file is loaded as-is (any extension casing); only a
    // directory scan filters to .dbf files, case-insensitively
    val reader = spark.read.format("binaryFile")
    val files =
      if (Files.isRegularFile(Paths.get(path))) reader.load(path)
      else reader.option("pathGlobFilter", "*.[dD][bB][fF]").load(path)
    // schema from the smallest driver-side read we can do: the first file
    val firstPath = files.select("path").orderBy("path").limit(1)
      .collect().headOption
      .getOrElse(throw new IllegalArgumentException(s"no DBF files at $path"))
      .getString(0)
    // bounded header read: headerSize is a u16, so 64 KiB upper-bounds the
    // header + descriptor region — never pull a whole (up to 2 GB) file
    // onto the driver for its schema
    val in = Files.newInputStream(Paths.get(new java.net.URI(firstPath)))
    val headBytes = try in.readNBytes(64 * 1024) finally in.close()
    val hdr = parseHeader(headBytes)
    val schema = schemaFor(hdr)
    val rows = files.select("content").rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](0)
      parseRecords(bytes, parseHeader(bytes))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Fixture/export writer (dimension-scale: collects to the driver — the
    * reference's DBF files are one-time prep inputs, not fact data). Supports
    * the C/N/L/D subset the reader round-trips. `maxRows` bounds the driver
    * collect so misuse on a fact table fails loudly instead of OOMing.
    */
  def write(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    val schema = df.schema
    val fields = schema.fields.map { sf =>
      sf.dataType match {
        case StringType  => DbfField(sf.name.take(10), 'C', 100, 0)
        case LongType | IntegerType => DbfField(sf.name.take(10), 'N', 18, 0)
        case DoubleType  => DbfField(sf.name.take(10), 'N', 18, 6)
        case BooleanType => DbfField(sf.name.take(10), 'L', 1, 0)
        case DateType    => DbfField(sf.name.take(10), 'D', 8, 0)
        case dt => throw new IllegalArgumentException(s"DBF writer: unsupported $dt")
      }
    }
    // limit+1 keeps the collect bounded even when the require is about to
    // fail — the driver never materializes more than maxRows+1 rows
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"DbfSource.write is a dimension-scale driver-side writer; " +
        s"input exceeds maxRows=$maxRows — write parquet instead")
    val recordSize = 1 + fields.map(_.length).sum
    val headerSize = 32 + fields.length * 32 + 1
    val out = new java.io.ByteArrayOutputStream()
    // file header
    out.write(0x03) // dBase III, no memo
    out.write(96); out.write(1); out.write(1) // static date: 1996-01-01
    writeU32le(out, rows.length)
    writeU16le(out, headerSize)
    writeU16le(out, recordSize)
    out.write(new Array[Byte](20))
    // field descriptors
    fields.foreach { f =>
      val name = f.name.getBytes(StandardCharsets.US_ASCII)
      out.write(java.util.Arrays.copyOf(name, 11))
      out.write(f.ftype.toInt)
      out.write(new Array[Byte](4))
      out.write(f.length); out.write(f.decimals)
      out.write(new Array[Byte](14))
    }
    out.write(0x0d)
    // records
    rows.foreach { row =>
      out.write(0x20) // active
      fields.zipWithIndex.foreach { case (f, i) =>
        val s = encode(f, row, i)
        out.write(s.getBytes(StandardCharsets.ISO_8859_1))
      }
    }
    out.write(0x1a)
    Files.write(Paths.get(path), out.toByteArray)
  }

  private def encode(f: DbfField, row: Row, i: Int): String = {
    val v = if (row.isNullAt(i)) null else row.get(i)
    val s = f.ftype match {
      case 'C' => if (v == null) "" else v.toString
      case 'N' =>
        if (v == null) ""
        else if (f.decimals == 0) v.toString
        else s"%.${f.decimals}f".format(v.asInstanceOf[Double])
      case 'L' => v match {
        case null             => "?"
        case java.lang.Boolean.TRUE  => "T"
        case _                => "F"
      }
      case 'D' =>
        if (v == null) "        "
        else v.toString.replace("-", "") // java.sql.Date yyyy-MM-dd → YYYYMMDD
      case _ => ""
    }
    require(s.length <= f.length, s"value too wide for DBF field ${f.name}: '$s'")
    if (f.ftype == 'N') (" " * (f.length - s.length)) + s  // numbers right-justified
    else s + (" " * (f.length - s.length))                 // text left-justified
  }

  private def writeU16le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def writeU32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
