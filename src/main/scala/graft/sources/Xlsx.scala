package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XLSX reader (OOXML spreadsheet — a zip of XML, both JDK-parseable), the
  * erde io matrix's spreadsheet driver re-expressed without POI/pandas
  * (reference: erde/io/xls.py). First row = header; every cell surfaces as a
  * string (cast downstream — same contract as Spark's csv without
  * inferSchema). Whole file per task; many files parallelize.
  */
object Xlsx {

  private def entries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map.empty[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zis.readAllBytes()
      e = zis.getNextEntry
    }
    out.toMap
  }

  private def dom(xml: Array[Byte]) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(xml))
  }

  /** Parses one sheet into rows of (columnIndex → string value). */
  private[sources] def parseRows(bytes: Array[Byte], sheet: String): Seq[Map[Int, String]] = {
    val files = entries(bytes)
    val shared: IndexedSeq[String] = files.get("xl/sharedStrings.xml").map { ss =>
      val doc = dom(ss)
      val sis = doc.getElementsByTagName("si")
      (0 until sis.getLength).map { i =>
        val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
        (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
      }
    }.getOrElse(IndexedSeq.empty)

    val sheetXml = files.getOrElse(s"xl/worksheets/$sheet.xml",
      throw new IllegalArgumentException(s"no worksheet $sheet in xlsx"))
    val doc = dom(sheetXml)
    val rows = doc.getElementsByTagName("row")
    def colIndex(ref: String): Int = {
      var v = 0
      ref.takeWhile(_.isLetter).foreach(c => v = v * 26 + (c - 'A' + 1))
      v - 1
    }
    (0 until rows.getLength).map { r =>
      val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("c")
      (0 until cells.getLength).flatMap { ci =>
        val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
        val idx = colIndex(c.getAttribute("r"))
        val t = c.getAttribute("t")
        val vNodes = c.getElementsByTagName("v")
        val isNodes = c.getElementsByTagName("is")
        val raw =
          if (vNodes.getLength > 0) Some(vNodes.item(0).getTextContent)
          else if (isNodes.getLength > 0) Some(isNodes.item(0).getTextContent)
          else None
        raw.map { v =>
          val value = t match {
            case "s" => shared(v.toInt)
            case _ => v
          }
          idx -> value
        }
      }.toMap
    }
  }

  /** Parses an ODS content.xml table into rows of (columnIndex → value),
    * honoring `table:number-columns-repeated`.
    */
  private[sources] def parseOdsRows(bytes: Array[Byte]): Seq[Map[Int, String]] = {
    val files = entries(bytes)
    val content = files.getOrElse("content.xml",
      throw new IllegalArgumentException("no content.xml in ods"))
    val doc = dom(content)
    val rows = doc.getElementsByTagName("table:table-row")
    (0 until rows.getLength).map { r =>
      val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("table:table-cell")
      var idx = 0
      val out = scala.collection.mutable.Map.empty[Int, String]
      (0 until cells.getLength).foreach { ci =>
        val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
        val repeat = Option(c.getAttribute("table:number-columns-repeated"))
          .filter(_.nonEmpty).map(_.toInt).getOrElse(1)
        val ps = c.getElementsByTagName("text:p")
        val text =
          if (ps.getLength > 0)
            Some((0 until ps.getLength).map(ps.item(_).getTextContent).mkString("\n"))
          else Option(c.getAttribute("office:value")).filter(_.nonEmpty)
        text.foreach { t => (0 until repeat).foreach(k => out(idx + k) = t) }
        idx += repeat
      }
      out.toMap
    }
  }

  /** Reads `*.ods` under `path` (OpenDocument spreadsheet — same contract as
    * [[read]]: header row → column names, all strings).
    */
  def readOds(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.ods").load(path)
      .select("content").as[Array[Byte]]
    val headRows = parseOdsRows(files.head())
    require(headRows.nonEmpty, "empty ods table")
    val header = headRows.head
    val nCols = header.keys.maxOption.getOrElse(-1) + 1
    val names = (0 until nCols).map(i => header.getOrElse(i, s"_c$i"))
    val schema = StructType(names.map(n => StructField(n, StringType)))
    val enc = RowEncoder.encoderFor(schema)
    files.mapPartitions { it =>
      it.flatMap { bytes =>
        parseOdsRows(bytes).drop(1)
          .filter(_.nonEmpty)
          .map(cells => Row.fromSeq((0 until nCols).map(i => cells.get(i).orNull)))
      }
    }(enc)
  }

  /** Reads `*.xlsx` under `path`: header row → column names, all strings. */
  def read(spark: SparkSession, path: String, sheet: String = "sheet1"): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select("content").as[Array[Byte]]

    val headRows = parseRows(files.head(), sheet)
    require(headRows.nonEmpty, "empty worksheet")
    val header = headRows.head
    val nCols = (header.keys.maxOption.getOrElse(-1)) + 1
    val names = (0 until nCols).map(i => header.getOrElse(i, s"_c$i"))
    val schema = StructType(names.map(n => StructField(n, StringType)))
    val enc = RowEncoder.encoderFor(schema)

    files.mapPartitions { it =>
      it.flatMap { bytes =>
        parseRows(bytes, sheet).drop(1).map { cells =>
          Row.fromSeq((0 until nCols).map(i => cells.get(i).orNull))
        }
      }
    }(enc)
  }
}
