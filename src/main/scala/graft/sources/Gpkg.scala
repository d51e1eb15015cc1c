package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

import graft.geom.WKB

/** GeoPackage reader: a minimal read-only SQLite b-tree scanner (public
  * file-format spec) plus the GPKG geometry-blob codec — no native driver,
  * runs on any executor (reference: erde/io/gpkg.py delegates to
  * fiona/GDAL, absent from this image).
  *
  * Whole-file per task via binaryFile (gpkg, like sqlite, is a single-file
  * random-access format); many files parallelize naturally. Supports table
  * b-trees with overflow pages, the rowid-alias INTEGER PRIMARY KEY, and
  * GPKG geometry blobs (envelope skipped, payload is standard WKB).
  */
object Gpkg {

  // ---- minimal sqlite ------------------------------------------------------

  private final class Sqlite(bytes: Array[Byte]) {
    require(new String(bytes, 0, 15, StandardCharsets.US_ASCII) == "SQLite format 3",
      "not a sqlite/gpkg file")
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    private val pageSizeRaw = buf.getShort(16) & 0xffff
    val pageSize: Int = if (pageSizeRaw == 1) 65536 else pageSizeRaw
    private val reserved = bytes(20) & 0xff
    val usable: Int = pageSize - reserved

    private def varint(pos: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(pos + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(pos + 8) & 0xff), 9) // 9th byte carries 8 bits
    }

    /** Full payload of a cell, following overflow pages when present. */
    private def payload(pos0: Int, total: Int): (Array[Byte], Int) = {
      val x = usable - 35
      if (total <= x) {
        val out = new Array[Byte](total)
        System.arraycopy(bytes, pos0, out, 0, total)
        (out, total)
      } else {
        val m = (usable - 12) * 32 / 255 - 23
        val k = m + (total - m) % (usable - 4)
        val local = if (k <= x) k else m
        val out = new Array[Byte](total)
        System.arraycopy(bytes, pos0, out, 0, local)
        var got = local
        var next = buf.getInt(pos0 + local)
        while (next != 0 && got < total) {
          val base = (next - 1) * pageSize
          val take = math.min(usable - 4, total - got)
          System.arraycopy(bytes, base + 4, out, got, take)
          got += take
          next = buf.getInt(base)
        }
        (out, local + 4)
      }
    }

    /** Decoded record values (sqlite serial types). */
    private def record(p: Array[Byte]): Seq[Any] = {
      val pb = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
      def v(pos: Int): (Long, Int) = {
        var value = 0L
        var i = 0
        while (true) {
          val b = p(pos + i) & 0xff
          if (i == 8) return (((value << 8) | b, 9))
          value = (value << 7) | (b & 0x7f)
          if ((b & 0x80) == 0) return ((value, i + 1))
          i += 1
        }
        (0, 0)
      }
      val (hdrLen, n0) = v(0)
      var pos = n0
      val types = ArrayBuffer[Long]()
      while (pos < hdrLen) {
        val (t, n) = v(pos)
        types += t
        pos += n
      }
      var dpos = hdrLen.toInt
      types.map { t =>
        def int(nb: Int): Long = {
          var x = 0L
          var i = 0
          while (i < nb) { x = (x << 8) | (p(dpos + i) & 0xff); i += 1 }
          val shift = 64 - nb * 8
          dpos += nb
          (x << shift) >> shift // sign extend
        }
        t match {
          case 0 => null
          case 1 => int(1)
          case 2 => int(2)
          case 3 => int(3)
          case 4 => int(4)
          case 5 => int(6)
          case 6 => int(8)
          case 7 => val d = pb.getDouble(dpos); dpos += 8; d
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(p, dpos, len, StandardCharsets.UTF_8)
            dpos += len
            s
          case n if n >= 12 =>
            val len = ((n - 12) / 2).toInt
            val b = new Array[Byte](len)
            System.arraycopy(p, dpos, b, 0, len)
            dpos += len
            b
          case other => throw new IllegalArgumentException(s"serial type $other")
        }
      }.toSeq
    }

    /** Scans a table b-tree rooted at `page` (1-based). */
    def table(page: Int): Seq[(Long, Seq[Any])] = {
      val out = ArrayBuffer[(Long, Seq[Any])]()
      def walk(pg: Int): Unit = {
        val base = (pg - 1) * pageSize
        val hdr = base + (if (pg == 1) 100 else 0)
        val typ = bytes(hdr) & 0xff
        val nCells = buf.getShort(hdr + 3) & 0xffff
        val ptrs = hdr + (if (typ == 5 || typ == 2) 12 else 8)
        typ match {
          case 13 => // table leaf
            var c = 0
            while (c < nCells) {
              val cell = base + (buf.getShort(ptrs + c * 2) & 0xffff)
              val (plen, n1) = varint(cell)
              val (rowid, n2) = varint(cell + n1)
              val (p, _) = payload(cell + n1 + n2, plen.toInt)
              out += ((rowid, record(p)))
              c += 1
            }
          case 5 => // table interior
            var c = 0
            while (c < nCells) {
              val cell = base + (buf.getShort(ptrs + c * 2) & 0xffff)
              walk(buf.getInt(cell))
              c += 1
            }
            walk(buf.getInt(hdr + 8)) // rightmost child
          case other => throw new IllegalArgumentException(s"unexpected page type $other")
        }
      }
      walk(page)
      out.toSeq
    }

    /** sqlite_master rows: (type, name, tbl_name, rootpage, sql). */
    def master: Seq[(String, String, String, Int, String)] =
      table(1).map { case (_, vals) =>
        (vals(0).asInstanceOf[String], vals(1).asInstanceOf[String],
          vals(2).asInstanceOf[String],
          vals(3) match { case l: Long => l.toInt; case _ => 0 },
          vals(4) match { case s: String => s; case _ => "" })
      }
  }

  /** Column (name, declared type) pairs from a CREATE TABLE statement. */
  private[sources] def parseColumns(sql: String): Seq[(String, String)] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val parts = ArrayBuffer[String]()
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    val constraint = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    parts.toSeq.map(_.trim).filter(_.nonEmpty).flatMap { p =>
      val name = p.split("\\s+")(0).stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`").stripPrefix("[").stripSuffix("]")
      if (constraint(name.toUpperCase)) None
      else Some((name, p.split("\\s+").drop(1).mkString(" ").toUpperCase))
    }
  }

  /** GPKG geometry blob → WKB payload (header + envelope skipped). */
  private[sources] def gpkgToWkb(blob: Array[Byte]): Array[Byte] = {
    require(blob.length > 8 && blob(0) == 'G' && blob(1) == 'P', "not a GPKG geometry blob")
    val flags = blob(3) & 0xff
    val envelope = (flags >> 1) & 0x7
    val envLen = envelope match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"bad envelope indicator $other")
    }
    val off = 8 + envLen
    val out = new Array[Byte](blob.length - off)
    System.arraycopy(blob, off, out, 0, out.length)
    out
  }

  private def sparkType(decl: String): DataType = decl match {
    case t if t.startsWith("INT") || t.startsWith("MEDIUMINT") || t.startsWith("SMALLINT") ||
      t.startsWith("TINYINT") || t.startsWith("BIGINT") || t.startsWith("BOOLEAN") => LongType
    case t if t.startsWith("REAL") || t.startsWith("DOUBLE") || t.startsWith("FLOAT") => DoubleType
    case t if t.startsWith("TEXT") || t.startsWith("VARCHAR") || t.startsWith("DATE") => StringType
    case _ => BinaryType
  }

  /** First feature layer of the file (or `layer`): columns as declared
    * (geometry column → WKB binary named as in the file).
    */
  def read(spark: SparkSession, path: String, layer: Option[String] = None): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.gpkg").load(path)
      .select("content").as[Array[Byte]]

    // schema from the first file
    val head = files.head()
    val db = new Sqlite(head)
    val geomCols = db.master.find(_._2 == "gpkg_geometry_columns")
      .map(m => db.table(m._4).map(_._2))
      .getOrElse(Seq.empty)
      .map(v => (v(0).asInstanceOf[String], v(1).asInstanceOf[String])).toMap
    val layerName = layer.getOrElse {
      require(geomCols.nonEmpty, "no feature layers in gpkg")
      require(layer.isDefined || geomCols.size == 1,
        s"multiple layers ${geomCols.keys.mkString(", ")} — pass layer=")
      geomCols.keys.head
    }
    val geomCol = geomCols.getOrElse(layerName,
      throw new IllegalArgumentException(s"layer $layerName not in gpkg_geometry_columns"))
    val masterRow = db.master.find(m => m._1 == "table" && m._2 == layerName)
      .getOrElse(throw new IllegalArgumentException(s"no table $layerName"))
    val cols = parseColumns(masterRow._5)

    val schema = StructType(cols.map { case (n, decl) =>
      StructField(n, if (n == geomCol) BinaryType else sparkType(decl))
    })
    val enc = RowEncoder.encoderFor(schema)
    val colDecls = cols.toArray
    // SQLite's rowid alias is specifically an INTEGER PRIMARY KEY column — a
    // plain nullable INT column must keep its NULLs, not inherit the rowid.
    val rowidAlias = cols.indexWhere { case (_, d) => d.contains("INTEGER PRIMARY KEY") }

    files.mapPartitions { it =>
      it.flatMap { fileBytes =>
        val fdb = new Sqlite(fileBytes)
        val root = fdb.master.find(m => m._1 == "table" && m._2 == layerName).get._4
        fdb.table(root).map { case (rowid, vals) =>
          val out = colDecls.zipWithIndex.map { case ((name, decl), i) =>
            val v = if (i < vals.length) vals(i) else null
            if (name == geomCol) {
              v match {
                case b: Array[Byte] => WKB.write(WKB.read(gpkgToWkb(b))) // normalize
                case _ => null
              }
            } else if (v == null && i == rowidAlias) rowid
            else (sparkType(decl), v) match {
              case (LongType, l: Long) => l
              case (DoubleType, d: Double) => d
              case (DoubleType, l: Long) => l.toDouble
              case (StringType, s: String) => s
              case (_, x) => x
            }
          }
          Row.fromSeq(out.toSeq)
        }
      }
    }(enc)
  }

  /** Feature layer names of a gpkg file (driver-side metadata helper). */
  def layers(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    val head = spark.read.format("binaryFile").option("pathGlobFilter", "*.gpkg")
      .load(path).select("content").as[Array[Byte]].head()
    val db = new Sqlite(head)
    db.master.find(_._2 == "gpkg_geometry_columns")
      .map(m => db.table(m._4).map(_._2(0).asInstanceOf[String]))
      .getOrElse(Seq.empty)
  }
}
