package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geom._

/** Pure-Scala FlatGeobuf driver (reference: erde/io/fgb.py:11 — erde reads
  * and writes .fgb through fiona/GDAL; the format itself is an open spec:
  * https://flatgeobuf.org/ — magic bytes, flatbuffer Header with a column
  * schema, optional packed Hilbert R-tree, then size-prefixed flatbuffer
  * Features).
  *
  * Read is distributed (one task per file via Spark's binaryFile source,
  * like [[Gpkg]]); the optional spatial index is skipped by its computed
  * size. Write is the driver-side single-file export path (bounded by
  * `maxRows`, like [[Shapefile.write]]) and emits no index — readers treat
  * `index_node_size = 0` as unindexed.
  */
object Fgb {

  private val Magic = Array[Byte](0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00)

  // FlatGeobuf GeometryType enum
  private val GtPoint = 1; private val GtLineString = 2; private val GtPolygon = 3
  private val GtMultiPoint = 4; private val GtMultiLineString = 5
  private val GtMultiPolygon = 6; private val GtCollection = 7

  // FlatGeobuf ColumnType enum
  private object Ct {
    val Byte = 0; val UByte = 1; val Bool = 2; val Short = 3; val UShort = 4
    val Int = 5; val UInt = 6; val Long = 7; val ULong = 8; val Float = 9
    val Double = 10; val String = 11; val Json = 12; val DateTime = 13; val Binary = 14
  }

  private def sparkType(ct: Int): DataType = ct match {
    case Ct.Bool => BooleanType
    case Ct.Byte | Ct.UByte | Ct.Short | Ct.UShort | Ct.Int | Ct.UInt | Ct.Long | Ct.ULong => LongType
    case Ct.Float | Ct.Double => DoubleType
    case Ct.String | Ct.Json | Ct.DateTime => StringType
    case _ => BinaryType
  }

  /** Packed Hilbert R-tree byte size (flatbush layout: 40-byte nodes, all
    * levels from the `numItems` leaves up to and including the root).
    */
  private[sources] def indexSize(numItems: Long, nodeSize: Int): Long = {
    if (numItems == 0 || nodeSize == 0) return 0
    var n = numItems
    var numNodes = n
    while (n != 1) {
      n = (n + nodeSize - 1) / nodeSize
      numNodes += n
    }
    numNodes * 40L
  }

  private final case class ColSpec(name: String, ct: Int)

  private def parseHeader(bb: ByteBuffer): (String, Int, Seq[ColSpec], Long, Int) = {
    val size = bb.getInt(8)
    val root = new Flatbuf.FbTable(bb, 12 + bb.getInt(12))
    val name = root.string(0).getOrElse("layer")
    val geomType = root.getByte(2) & 0xff
    val cols = root.tableVector(7).map { c =>
      ColSpec(c.string(0).getOrElse(""), c.getByte(1) & 0xff)
    }
    val count = root.getLong(8)
    val nodeSize = root.getShort(9, 16) & 0xffff
    val _ = size
    (name, geomType, cols.toSeq, count, nodeSize)
  }

  private def geomOf(t: Flatbuf.FbTable, headerType: Int): Geom = {
    val gt = { val own = t.getByte(6) & 0xff; if (own != 0) own else headerType }
    val xy = t.doubleVector(1)
    val ends = t.intVector(0)
    def rings: Array[Array[Double]] = {
      if (ends.isEmpty) Array(xy)
      else {
        var start = 0
        ends.map { e => val r = xy.slice(start * 2, e * 2); start = e; r }
      }
    }
    gt match {
      case GtPoint => Point(xy(0), xy(1))
      case GtLineString => LineString(xy)
      case GtMultiPoint => MultiPoint(xy)
      case GtPolygon => Polygon(rings)
      case GtMultiLineString => MultiLineString(rings)
      case GtMultiPolygon =>
        MultiPolygon(t.tableVector(7).map { p =>
          val pxy = p.doubleVector(1)
          val pends = p.intVector(0)
          if (pends.isEmpty) Array(pxy)
          else {
            var start = 0
            pends.map { e => val r = pxy.slice(start * 2, e * 2); start = e; r }
          }
        }.toArray)
      case GtCollection =>
        GeomCollection(t.tableVector(7).map(p => geomOf(p, 0)).toArray)
      case other => throw new IllegalArgumentException(s"unsupported fgb geometry type $other")
    }
  }

  /** Decodes one feature's property stream. `keep(idx)` is the OUTPUT slot
    * for file column `idx`, or −1 to skip: the stream is self-describing
    * (tagged, length-prefixed), so skipped values advance the cursor without
    * allocating strings/blobs — the projection lever for wide tables.
    */
  private def parseProps(bb: ByteBuffer, at: Int, len: Int, cols: Seq[ColSpec],
      keep: Array[Int], nOut: Int): Array[Any] = {
    val out = new Array[Any](nOut)
    var p = at
    val end = at + len
    while (p < end) {
      val idx = bb.getShort(p) & 0xffff
      p += 2
      val ct = cols(idx).ct
      val o = keep(idx)
      ct match {
        case Ct.Bool => if (o >= 0) out(o) = bb.get(p) != 0; p += 1
        case Ct.Byte => if (o >= 0) out(o) = bb.get(p).toLong; p += 1
        case Ct.UByte => if (o >= 0) out(o) = (bb.get(p) & 0xff).toLong; p += 1
        case Ct.Short => if (o >= 0) out(o) = bb.getShort(p).toLong; p += 2
        case Ct.UShort => if (o >= 0) out(o) = (bb.getShort(p) & 0xffff).toLong; p += 2
        case Ct.Int => if (o >= 0) out(o) = bb.getInt(p).toLong; p += 4
        case Ct.UInt => if (o >= 0) out(o) = (bb.getInt(p) & 0xffffffffL); p += 4
        case Ct.Long | Ct.ULong => if (o >= 0) out(o) = bb.getLong(p); p += 8
        case Ct.Float => if (o >= 0) out(o) = bb.getFloat(p).toDouble; p += 4
        case Ct.Double => if (o >= 0) out(o) = bb.getDouble(p); p += 8
        case Ct.String | Ct.Json | Ct.DateTime =>
          val n = bb.getInt(p); p += 4
          if (o >= 0) {
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = bb.get(p + i); i += 1 }
            out(o) = new String(b, "UTF-8")
          }
          p += n
        case _ =>
          val n = bb.getInt(p); p += 4
          if (o >= 0) {
            val b = new Array[Byte](n)
            var i = 0
            while (i < n) { b(i) = bb.get(p + i); i += 1 }
            out(o) = b
          }
          p += n
      }
    }
    out
  }

  /** Projection plumbing shared by [[read]]/[[readSplit]]: the projected
    * Spark schema (file column order, geometry last when kept), the
    * file-column → output-slot map for [[parseProps]], and whether the
    * geometry needs decoding at all (skipping it skips the whole
    * flatbuffer-walk + WKB encode per feature).
    */
  private def projection(cols: Seq[ColSpec], columns: Seq[String])
      : (StructType, Array[Int], Int, Boolean) = {
    val all = cols.map(_.name) :+ "geometry"
    if (columns.isEmpty) {
      val schema = StructType(
        cols.map(c => StructField(c.name, sparkType(c.ct))) :+ StructField("geometry", BinaryType))
      (schema, cols.indices.toArray, cols.length, true)
    } else {
      val want = columns.toSet
      val missing = want -- all.toSet
      require(missing.isEmpty, s"columns not in fgb schema: ${missing.toSeq.sorted.mkString(", ")}")
      val keptProps = cols.zipWithIndex.filter { case (c, _) => want(c.name) }
      val keep = Array.fill(cols.length)(-1)
      keptProps.zipWithIndex.foreach { case ((_, fileIdx), outIdx) => keep(fileIdx) = outIdx }
      val withGeom = want("geometry")
      val schema = StructType(
        keptProps.map { case (c, _) => StructField(c.name, sparkType(c.ct)) } ++
          (if (withGeom) Seq(StructField("geometry", BinaryType)) else Nil))
      (schema, keep, keptProps.size, withGeom)
    }
  }

  /** Layer name and schema of an fgb file (geometry travels as WKB binary). */
  def schemaOf(bytes: Array[Byte]): (String, StructType) = {
    require(bytes.length > 12 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf file (bad magic)")
    val bb = Flatbuf.le(bytes)
    val (name, _, cols, _, _) = parseHeader(bb)
    (name, StructType(
      cols.map(c => StructField(c.name, sparkType(c.ct))) :+ StructField("geometry", BinaryType)))
  }

  /** Reads every `.fgb` under `path` — one task per file, header parsed once
    * on the driver for the schema, features decoded executor-side.
    * `columns` (optional) projects the decode: unrequested properties are
    * cursor-skipped in the tagged property stream (no allocation) and an
    * unrequested geometry skips the flatbuffer walk + WKB encode entirely.
    */
  def read(spark: SparkSession, path: String, filterWkt: Option[String] = None,
      columns: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    require(filterWkt.isEmpty || columns.isEmpty || columns.contains("geometry"),
      "filterWkt needs the geometry column — add it to columns")
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.fgb").load(path)
      .select("content").as[Array[Byte]]
    val head = files.head()
    val bbHead = Flatbuf.le(head)
    val (_, _, headCols, _, _) = parseHeader(bbHead)
    val (schema, keep, nOut, withGeom) = projection(headCols, columns)
    val enc = RowEncoder.encoderFor(schema)
    val parsed = files.mapPartitions { it =>
      it.flatMap { bytes =>
        val bb = Flatbuf.le(bytes)
        val (_, geomType, cols, count, nodeSize) = parseHeader(bb)
        val headerSize = bb.getInt(8)
        var p = 12 + headerSize + indexSize(count, nodeSize).toInt
        val rows = ArrayBuffer[Row]()
        while (p + 4 <= bytes.length) {
          val featSize = bb.getInt(p)
          val feat = new Flatbuf.FbTable(bb, p + 4 + bb.getInt(p + 4))
          val props = feat.byteVectorPos(1) match {
            case Some((at, len)) => parseProps(bb, at, len, cols, keep, nOut)
            case None => new Array[Any](nOut)
          }
          val row =
            if (withGeom) {
              val geom = feat.table(0).map(g => WKB.write(geomOf(g, geomType))).orNull
              Row.fromSeq(props.toIndexedSeq :+ geom)
            } else Row.fromSeq(props.toIndexedSeq)
          rows += row
          p += 4 + featSize
        }
        rows.iterator
      }
    }(enc)
    filterWkt match {
      case Some(wkt) =>
        import graft.functions.GeoFunctions._
        parsed.where(st_intersects(col("geometry"), st_geomfromtext(lit(wkt))))
      case None => parsed
    }
  }

  /** Feature-frame byte ranges of one fgb file, `featuresPerSplit` features
    * per range — found by walking the size prefixes only (seek past each
    * feature body, never read it).
    */
  private[sources] def featureRanges(raf: java.io.RandomAccessFile,
      featuresPerSplit: Int): Seq[(Long, Long)] = {
    def readIntLE(): Int = {
      val b = new Array[Byte](4)
      raf.readFully(b)
      (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
    }
    raf.seek(8)
    val headerSize = readIntLE()
    // header needed for the index-skip arithmetic
    val hdr = new Array[Byte](headerSize)
    raf.readFully(hdr)
    val full = new Array[Byte](12 + headerSize)
    System.arraycopy(hdr, 0, full, 12, headerSize)
    val bb = Flatbuf.le(full)
    val root = new Flatbuf.FbTable(bb, 12 + bb.getInt(12))
    val count = root.getLong(8)
    val nodeSize = root.getShort(9, 16) & 0xffff
    var p = 12L + headerSize + indexSize(count, nodeSize)
    val len = raf.length()
    val out = ArrayBuffer[(Long, Long)]()
    var chunkStart = p
    var inChunk = 0
    while (p + 4 <= len) {
      raf.seek(p)
      val featSize = readIntLE()
      p += 4 + featSize
      inChunk += 1
      if (inChunk >= featuresPerSplit) {
        out += ((chunkStart, p - chunkStart))
        chunkStart = p
        inChunk = 0
      }
    }
    if (inChunk > 0) out += ((chunkStart, p - chunkStart))
    out.toSeq
  }

  /** Splittable read: feature ranges listed with size-prefix-only IO, then
    * decoded in parallel ranged reads (each size-prefixed Feature flatbuffer
    * is self-contained) — one big fgb fans out across the cluster. `path`
    * must be executor-visible (local/NFS; HDFS would swap in ranged
    * FileSystem reads at this seam).
    */
  def readSplit(spark: SparkSession, path: String, featuresPerSplit: Int = 4096,
      columns: Seq[String] = Nil): DataFrame = {
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
      .filter(_.toString.endsWith(".fgb")).map(_.toString).toSeq.sorted
    require(files.nonEmpty, s"no .fgb files under $path")
    val headBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(files.head))
    val bbHead = Flatbuf.le(headBytes)
    val (_, geomType, cols, _, _) = parseHeader(bbHead)
    val (schema, keep, nOut, withGeom) = projection(cols, columns)
    val ranges = files.flatMap { f =>
      val raf = new java.io.RandomAccessFile(f, "r")
      try featureRanges(raf, featuresPerSplit).map { case (off, len) => (f, off, len) }
      finally raf.close()
    }
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(1, math.min(ranges.size, spark.sparkContext.defaultParallelism * 2)))
      .flatMap { case (f, off, len) =>
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val buf = new Array[Byte](len.toInt)
          raf.seek(off)
          raf.readFully(buf)
          val bb = Flatbuf.le(buf)
          val rows = ArrayBuffer[Row]()
          var p = 0
          while (p + 4 <= buf.length) {
            val featSize = bb.getInt(p)
            val feat = new Flatbuf.FbTable(bb, p + 4 + bb.getInt(p + 4))
            val props = feat.byteVectorPos(1) match {
              case Some((at, l)) => parseProps(bb, at, l, cols, keep, nOut)
              case None => new Array[Any](nOut)
            }
            rows += (if (withGeom) {
              val geom = feat.table(0).map(g => WKB.write(geomOf(g, geomType))).orNull
              Row.fromSeq(props.toIndexedSeq :+ geom)
            } else Row.fromSeq(props.toIndexedSeq))
            p += 4 + featSize
          }
          rows.iterator
        } finally raf.close()
      }
    spark.createDataFrame(rdd, schema)
  }

  // ---- writer --------------------------------------------------------------

  private def fgbGeomType(g: Geom): Int = g match {
    case _: Point => GtPoint
    case _: LineString => GtLineString
    case _: MultiPoint => GtMultiPoint
    case _: Polygon => GtPolygon
    case _: MultiLineString => GtMultiLineString
    case _: MultiPolygon => GtMultiPolygon
    case _: GeomCollection => GtCollection
  }

  private def geomFields(g: Geom): Seq[(Int, Flatbuf.FbValue)] = {
    import Flatbuf._
    def endsOf(parts: Array[Array[Double]]): Array[Int] = {
      var acc = 0
      parts.map { r => acc += r.length / 2; acc }
    }
    val typeField = (6, Scalar(Array(fgbGeomType(g).toByte)))
    g match {
      case Point(x, y) => Seq((1, Ref(_.writeDoubleVector(Array(x, y)))), typeField)
      case LineString(cs) => Seq((1, Ref(_.writeDoubleVector(cs))), typeField)
      case MultiPoint(cs) => Seq((1, Ref(_.writeDoubleVector(cs))), typeField)
      case Polygon(rings) =>
        val flat = rings.flatten
        (if (rings.length > 1) Seq((0, Ref((b: FbBuilder) => b.writeIntVector(endsOf(rings))))) else Nil) ++
          Seq((1, Ref((b: FbBuilder) => b.writeDoubleVector(flat))), typeField)
      case MultiLineString(parts) =>
        val flat = parts.flatten
        (if (parts.length > 1) Seq((0, Ref((b: FbBuilder) => b.writeIntVector(endsOf(parts))))) else Nil) ++
          Seq((1, Ref((b: FbBuilder) => b.writeDoubleVector(flat))), typeField)
      case MultiPolygon(polys) =>
        Seq((7, Ref((b: FbBuilder) => b.writeTableVector(
          polys.toIndexedSeq.map(rings => (bb: FbBuilder) => bb.writeTable(geomFields(Polygon(rings))))))),
          typeField)
      case GeomCollection(gs) =>
        Seq((7, Ref((b: FbBuilder) => b.writeTableVector(
          gs.toIndexedSeq.map(gg => (bb: FbBuilder) => bb.writeTable(geomFields(gg)))))),
          typeField)
    }
  }

  private def colSpecOf(f: StructField): ColSpec = f.dataType match {
    case BooleanType => ColSpec(f.name, Ct.Bool)
    case ByteType | ShortType | IntegerType | LongType => ColSpec(f.name, Ct.Long)
    case FloatType | DoubleType => ColSpec(f.name, Ct.Double)
    case StringType => ColSpec(f.name, Ct.String)
    case BinaryType => ColSpec(f.name, Ct.Binary)
    case other => throw new IllegalArgumentException(s"fgb: unsupported column type $other for ${f.name}")
  }

  private def propBytes(row: Row, idxs: Seq[(Int, ColSpec)]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    def putShort(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
    def putInt(v: Int): Unit = { var i = 0; while (i < 4) { out += (v >> (8 * i)).toByte; i += 1 } }
    def putLong(v: Long): Unit = { var i = 0; while (i < 8) { out += (v >> (8 * i)).toByte; i += 1 } }
    idxs.zipWithIndex.foreach { case ((rowIdx, spec), colIdx) =>
      if (!row.isNullAt(rowIdx)) {
        putShort(colIdx)
        spec.ct match {
          case Ct.Bool => out += (if (row.getBoolean(rowIdx)) 1 else 0).toByte
          case Ct.Long =>
            putLong(row.get(rowIdx) match {
              case b: Byte => b.toLong; case s: Short => s.toLong
              case i: Int => i.toLong; case l: Long => l
            })
          case Ct.Double =>
            putLong(java.lang.Double.doubleToLongBits(row.get(rowIdx) match {
              case f: Float => f.toDouble; case d: Double => d
            }))
          case Ct.String =>
            val b = row.getString(rowIdx).getBytes("UTF-8")
            putInt(b.length); out ++= b
          case Ct.Binary =>
            val b = row.getAs[Array[Byte]](rowIdx)
            putInt(b.length); out ++= b
          case other => throw new IllegalArgumentException(s"fgb write: column type $other")
        }
      }
    }
    out.toArray
  }

  /** Serializes `rows` as one complete .fgb byte stream (magic + header +
    * size-prefixed features, no spatial index) — shared by the driver-side
    * [[write]] and the per-partition shards of [[writeSharded]].
    */
  private def writeOne(rows: Array[Row], schema: StructType, geometryCol: String,
      layerName: String, out: java.io.OutputStream): Unit = {
    import Flatbuf._
    val attrFields = schema.fields.filterNot(_.name == geometryCol)
    val specs = attrFields.map(colSpecOf)
    val rowIdxs = attrFields.map(f => schema.fieldIndex(f.name)).zip(specs).toSeq
    val geomIdx = schema.fieldIndex(geometryCol)
    val geoms = rows.map(r => WKB.read(r.getAs[Array[Byte]](geomIdx)))
    val types = geoms.map(fgbGeomType).distinct
    val headerType = if (types.length == 1) types.head else 0

    out.write(Magic)
    // header flatbuffer
    val hb = new FbBuilder
    val headerPos = hb.writeTable(Seq(
      0 -> Ref((b: FbBuilder) => b.writeString(layerName)),
      2 -> Scalar(Array(headerType.toByte)),
      7 -> Ref((b: FbBuilder) => b.writeTableVector(specs.toIndexedSeq.map { spec => (bb: FbBuilder) =>
        bb.writeTable(Seq(
          0 -> Ref((b2: FbBuilder) => b2.writeString(spec.name)),
          1 -> Scalar(Array(spec.ct.toByte))))
      })),
      8 -> Scalar { val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(rows.length.toLong); b.array() },
      9 -> Scalar(Array[Byte](0, 0)) // index_node_size = 0: no index follows
    ))
    out.write(hb.sizePrefixed(headerPos))
    // features
    rows.zip(geoms).foreach { case (row, geom) =>
      val fb = new FbBuilder
      val props = propBytes(row, rowIdxs)
      val featPos = fb.writeTable(Seq(
        0 -> Ref((b: FbBuilder) => b.writeTable(geomFields(geom)))) ++
        (if (props.nonEmpty) Seq(1 -> Ref((b: FbBuilder) => b.writeByteVector(props))) else Nil))
      out.write(fb.sizePrefixed(featPos))
    }
  }

  /** Writes one `.fgb` file (driver-side legacy-export path, no spatial
    * index, capped at `maxRows` like [[Shapefile.write]]). The scale path is
    * [[writeSharded]].
    */
  def write(df: DataFrame, path: String, geometryCol: String = "geometry",
      layerName: String = "layer", maxRows: Int = 1000000): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"Fgb.write collects to the driver and is capped at maxRows=$maxRows rows; " +
        "use writeSharded (one .fgb per partition) or parquet/geojsonseq for large frames")
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try writeOne(rows, df.schema, geometryCol, layerName, out) finally out.close()
  }

  /** Distributed multi-file write — one `part-NNNNN.fgb` per non-empty
    * partition under `dir`, plus a `_manifest.json` listing shards and row
    * counts. No driver collect, no row cap: each task streams only ITS
    * partition (repartition upstream to size the shards). `dir` must be
    * visible to executors (local/NFS — same contract as [[readSplit]], which
    * reads the shard set back as one frame; task retries rewrite their own
    * shard file idempotently). Every shard is a complete standalone .fgb,
    * so external tools read them individually too.
    */
  def writeSharded(df: DataFrame, dir: String, geometryCol: String = "geometry",
      layerName: String = "layer"): Unit = {
    val schema = df.schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val counts = df.rdd.mapPartitionsWithIndex { (i, it) =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val name = f"part-$i%05d.fgb"
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(new java.io.File(dir, name)))
        try writeOne(rows, schema, geometryCol, layerName, out) finally out.close()
        Iterator.single(name -> rows.length.toLong)
      }
    }.collect().sortBy(_._1).toIndexedSeq
    // an all-empty frame still yields one header-only shard so read/readSplit
    // recover the schema instead of failing on an empty directory
    val shards =
      if (counts.nonEmpty) counts
      else {
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(new java.io.File(dir, "part-00000.fgb")))
        try writeOne(Array.empty, schema, geometryCol, layerName, out) finally out.close()
        IndexedSeq("part-00000.fgb" -> 0L)
      }
    val manifest = shards.map { case (n, c) => s"""{"file":"$n","rows":$c}""" }
      .mkString("[", ",", "]")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_manifest.json"),
      (s"""{"layer":"$layerName","shards":$manifest}""" + "\n").getBytes("UTF-8"))
  }
}
