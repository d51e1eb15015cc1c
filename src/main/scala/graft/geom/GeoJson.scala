package graft.geom

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Minimal JSON + GeoJSON geometry codec (RFC 7946), dependency-free like the
  * rest of the kernel. Parses the subset GeoJSON needs: objects, arrays,
  * strings, numbers, booleans, null. Used by the IO-layer expressions
  * (st_geomfromgeojson, feature splitting) — reference: erde/io geojson /
  * geojsonseq drivers.
  */
object GeoJson {

  sealed trait J
  final case class JObj(fields: LinkedHashMap[String, J]) extends J
  final case class JArr(items: ArrayBuffer[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(d: Double, raw: String) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i in JSON")
      i += 1
    }
    def parse(): J = { val v = value(); ws(); v }
    private def value(): J = {
      ws()
      if (i >= s.length) throw new IllegalArgumentException("unexpected end of JSON")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _ => num()
      }
    }
    private def obj(): JObj = {
      expect('{'); ws()
      val m = LinkedHashMap.empty[String, J]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(m) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        expect(':')
        m(k) = value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JObj(m)
    }
    private def arr(): JArr = {
      expect('['); ws()
      val b = ArrayBuffer.empty[J]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(b) }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      JArr(b)
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.toString
    }
    private def num(): JNum = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      val raw = s.substring(start, i)
      JNum(raw.toDouble, raw)
    }
  }

  def parse(s: String): J = new Parser(s).parse()

  // ---- geometry ----------------------------------------------------------

  private def coordPair(j: J): (Double, Double) = j match {
    case JArr(items) if items.length >= 2 =>
      (items(0).asInstanceOf[JNum].d, items(1).asInstanceOf[JNum].d)
    case _ => throw new IllegalArgumentException("bad GeoJSON position")
  }

  private def packed(j: J): Array[Double] = j match {
    case JArr(items) =>
      val out = new Array[Double](items.length * 2)
      var k = 0
      items.foreach { p => val (x, y) = coordPair(p); out(k) = x; out(k + 1) = y; k += 2 }
      out
    case _ => throw new IllegalArgumentException("bad GeoJSON coordinate array")
  }

  private def rings(j: J): Array[Array[Double]] = j match {
    case JArr(items) => items.map(packed).toArray
    case _ => throw new IllegalArgumentException("bad GeoJSON rings")
  }

  /** GeoJSON geometry object → [[Geom]]. */
  def readGeometry(json: String): Geom = geomOf(parse(json))

  def geomOf(j: J): Geom = {
    val o = j.asInstanceOf[JObj]
    val coords = o.fields.get("coordinates")
    o.fields("type").asInstanceOf[JStr].s match {
      case "Point" => val (x, y) = coordPair(coords.get); Point(x, y)
      case "MultiPoint" => MultiPoint(packed(coords.get))
      case "LineString" => LineString(packed(coords.get))
      case "MultiLineString" => MultiLineString(rings(coords.get))
      case "Polygon" => Polygon(rings(coords.get))
      case "MultiPolygon" =>
        MultiPolygon(coords.get.asInstanceOf[JArr].items.map(rings).toArray)
      case "GeometryCollection" =>
        GeomCollection(o.fields("geometries").asInstanceOf[JArr].items.map(geomOf).toArray)
      case other => throw new IllegalArgumentException(s"unknown GeoJSON type $other")
    }
  }

  /** [[Geom]] → GeoJSON geometry object text. */
  def writeGeometry(g: Geom): String = {
    def n(d: Double): String =
      if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString else d.toString
    def pos(x: Double, y: Double) = s"[${n(x)},${n(y)}]"
    def arr(cs: Array[Double]): String = {
      val b = new StringBuilder("[")
      var i = 0
      while (i < cs.length) {
        if (i > 0) b += ','
        b ++= pos(cs(i), cs(i + 1))
        i += 2
      }
      (b += ']').toString
    }
    def ringsS(rs: Array[Array[Double]]): String = rs.map(arr).mkString("[", ",", "]")
    g match {
      case Point(x, y) => s"""{"type":"Point","coordinates":${pos(x, y)}}"""
      case MultiPoint(cs) => s"""{"type":"MultiPoint","coordinates":${arr(cs)}}"""
      case LineString(cs) => s"""{"type":"LineString","coordinates":${arr(cs)}}"""
      case MultiLineString(ps) => s"""{"type":"MultiLineString","coordinates":${ringsS(ps)}}"""
      case Polygon(rs) => s"""{"type":"Polygon","coordinates":${ringsS(rs)}}"""
      case MultiPolygon(ps) =>
        s"""{"type":"MultiPolygon","coordinates":${ps.map(ringsS).mkString("[", ",", "]")}}"""
      case GeomCollection(gs) =>
        s"""{"type":"GeometryCollection","geometries":${gs.map(writeGeometry).mkString("[", ",", "]")}}"""
    }
  }

  /** JSON value → flat string form (for map<string,string> properties). */
  def stringify(j: J): String = j match {
    case JStr(s) => s
    case JNum(_, raw) => raw
    case JBool(b) => b.toString
    case JNull => "null"
    case other => writeJson(other)
  }

  def writeJson(j: J): String = j match {
    case JObj(fields) =>
      fields.map { case (k, v) => s"${quote(k)}:${writeJson(v)}" }.mkString("{", ",", "}")
    case JArr(items) => items.map(writeJson).mkString("[", ",", "]")
    case JStr(s) => quote(s)
    case JNum(_, raw) => raw
    case JBool(b) => b.toString
    case JNull => "null"
  }

  def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case '\n' => b ++= "\\n"
      case '\r' => b ++= "\\r"
      case '\t' => b ++= "\\t"
      case c if c < ' ' => b ++= f"\\u${c.toInt}%04x"
      case c => b += c
    }
    (b += '"').toString
  }
}
