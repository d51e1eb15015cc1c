package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

/** Minimal in-process PostgreSQL server: speaks enough of wire protocol v3
  * (startup, optional cleartext/MD5 auth, simple query, text results) to
  * exercise [[Postgres]] end-to-end inside this zero-egress build — the same
  * hermetic-double pattern as the OSRM router's canned transport. NOT a
  * database: tables are in-memory string matrices and the SQL "engine"
  * understands only the statement shapes the driver emits (DROP/CREATE/
  * INSERT/SELECT * [WHERE range][LIMIT 0]/SELECT min,max/ALTER/UPDATE
  * st_setsrid/BEGIN/COMMIT/DECLARE CURSOR/FETCH/CLOSE — cursors are
  * per-connection snapshots, like a real server's within one transaction).
  * Thread-per-connection, so partitioned reads and per-partition
  * writes genuinely run concurrently against it.
  */
final class PgMiniServer(auth: String = "trust", user: String = "graft",
    password: String = "") extends AutoCloseable {
  require(Set("trust", "password", "md5").contains(auth), s"auth '$auth'")

  private final case class Table(
      cols: Vector[String],
      types: Vector[Int],
      rows: mutable.ArrayBuffer[Array[String]])

  private val tables = mutable.Map.empty[String, Table]
  private val lock = new Object
  /** Every statement processed, in arrival order (assertable by specs). */
  val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      val t = new Thread(() => handle(s), "pgmini-conn")
      t.setDaemon(true)
      t.start()
    } catch { case _: Exception => () } // closed
  }, "pgmini-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = server.close()

  /** Current rows of a table (for assertions). */
  def tableRows(name: String): Seq[Array[String]] =
    lock.synchronized(tables(name).rows.toVector)
  def tableCols(name: String): Seq[String] = lock.synchronized(tables(name).cols)

  // ---- protocol ------------------------------------------------------------

  private def handle(socket: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(socket.getInputStream, 1 << 16))
    val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream, 1 << 16))

    def msg(t: Char, body: Array[Byte]): Unit = {
      out.writeByte(t)
      out.writeInt(body.length + 4)
      out.write(body)
    }
    def cstr(b: java.io.ByteArrayOutputStream, s: String): Unit = {
      b.write(s.getBytes(UTF_8)); b.write(0)
    }
    def i32(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def readyForQuery(): Unit = { msg('Z', Array('I'.toByte)); out.flush() }
    val cursors = mutable.Map.empty[String, Cursor] // per-connection state

    try {
      // startup: length + protocol + params
      val len = in.readInt() - 4
      val body = new Array[Byte](len)
      in.readFully(body)
      // ignore params; negotiate auth
      val salt = Array[Byte](0x21, 0x43, 0x65, (0x87 - 256).toByte)
      auth match {
        case "trust" => msg('R', i32(0))
        case "password" =>
          msg('R', i32(3)); out.flush()
          val given = readPasswordMessage(in)
          if (given != password) { sendError(msg, cstr, "28P01", "password authentication failed"); out.flush(); return }
          msg('R', i32(0))
        case "md5" =>
          msg('R', i32(5) ++ salt); out.flush()
          val given = readPasswordMessage(in)
          val inner = md5hex((password + user).getBytes(UTF_8))
          val want = "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
          if (given != want) { sendError(msg, cstr, "28P01", "password authentication failed"); out.flush(); return }
          msg('R', i32(0))
      }
      readyForQuery()

      var open = true
      while (open) {
        val t = in.readByte().toChar
        val l = in.readInt() - 4
        val payload = new Array[Byte](l)
        in.readFully(payload)
        t match {
          case 'X' => open = false
          case 'Q' =>
            val sql = new String(payload, 0, math.max(0, payload.length - 1), UTF_8).trim
            statements.add(sql)
            try {
              execute(sql, cursors) match {
                case Left(tag) =>
                  val b = new java.io.ByteArrayOutputStream(); cstr(b, tag)
                  msg('C', b.toByteArray)
                case Right((cols, types, rows)) =>
                  val rd = new java.io.ByteArrayOutputStream()
                  rd.write(java.nio.ByteBuffer.allocate(2).putShort(cols.size.toShort).array())
                  cols.zip(types).foreach { case (c, oid) =>
                    cstr(rd, c)
                    rd.write(i32(0)); rd.write(Array[Byte](0, 0)) // table oid, attnum
                    rd.write(i32(oid))
                    rd.write(Array[Byte](0, 8)); rd.write(i32(-1)) // typlen, typmod
                    rd.write(Array[Byte](0, 0)) // text format
                  }
                  msg('T', rd.toByteArray)
                  rows.foreach { r =>
                    val dr = new java.io.ByteArrayOutputStream()
                    dr.write(java.nio.ByteBuffer.allocate(2).putShort(r.length.toShort).array())
                    r.foreach {
                      case null => dr.write(i32(-1))
                      case v =>
                        val bytes = v.getBytes(UTF_8)
                        dr.write(i32(bytes.length)); dr.write(bytes)
                    }
                    msg('D', dr.toByteArray)
                  }
                  val b = new java.io.ByteArrayOutputStream(); cstr(b, s"SELECT ${rows.size}")
                  msg('C', b.toByteArray)
              }
            } catch {
              case e: Exception => sendError(msg, cstr, "42601", Option(e.getMessage).getOrElse("error"))
            }
            readyForQuery()
          case _ => // ignore other frontend messages
        }
      }
    } catch { case _: Exception => () } // connection dropped
    finally socket.close()
  }

  private def readPasswordMessage(in: DataInputStream): String = {
    val t = in.readByte().toChar
    val l = in.readInt() - 4
    val body = new Array[Byte](l)
    in.readFully(body)
    if (t != 'p') "" else new String(body, 0, math.max(0, body.length - 1), UTF_8)
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def sendError(msg: (Char, Array[Byte]) => Unit,
      cstr: (java.io.ByteArrayOutputStream, String) => Unit,
      code: String, message: String): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    b.write('S'); cstr(b, "ERROR")
    b.write('C'); cstr(b, code)
    b.write('M'); cstr(b, message)
    b.write(0)
    msg('E', b.toByteArray)
  }

  // ---- the tiny "engine" ---------------------------------------------------

  private def unquoteIdent(s: String): String = {
    val t = s.trim
    if (t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t.toLowerCase
  }

  private def typeOid(pgType: String): Int = pgType.trim.toLowerCase match {
    case "boolean" => 16
    case "bytea" => 17
    case "bigint" => 20
    case "smallint" => 21
    case "integer" => 23
    case "real" => 700
    case "double precision" => 701
    case "date" => 1082
    case "timestamp" => 1114
    case "numeric" => 1700
    case _ => 25 // text, Geometry, anything else
  }

  private final class Cursor(
      val cols: Vector[String],
      val types: Vector[Int],
      val rows: Vector[Array[String]]) {
    var pos: Int = 0
  }

  private val DropRe = "(?is)^DROP TABLE IF EXISTS\\s+(.+)$".r
  private val CreateRe = "(?is)^CREATE TABLE\\s+([^(]+)\\((.*)\\)$".r
  private val InsertRe = "(?is)^INSERT INTO\\s+([^(]+)\\(([^)]*)\\)\\s*VALUES\\s*(.*)$".r
  private val SelectLimit0Re = "(?is)^SELECT \\* FROM\\s+(\\S+)\\s+LIMIT 0$".r
  private val SelectAllRe = "(?is)^SELECT \\* FROM\\s+(\\S+)$".r
  private val SelectWhereRe =
    ("(?is)^SELECT \\* FROM\\s+(\\S+)\\s+WHERE\\s+\\(?(\\S+)\\s*>=\\s*([^\\s)]+)\\s+AND\\s+" +
      "\\S+\\s*(<|<=)\\s*([^\\s)]+)\\)?(\\s+OR\\s+\\S+\\s+IS\\s+NULL)?$").r
  private val MinMaxRe = "(?is)^SELECT min\\((\\S+)\\), max\\(\\S+\\) FROM\\s+(\\S+)$".r
  private val AlterRe = "(?is)^ALTER TABLE\\s+.*$".r
  private val SetSridRe =
    "(?is)^UPDATE\\s+(\\S+)\\s+SET\\s+(\\S+?)\\s*=\\s*st_setsrid\\(\\s*\\S+?\\s*,\\s*(\\d+)\\s*\\)$".r
  private val UpdateRe = "(?is)^UPDATE\\s+.*$".r
  private val BeginRe = "(?is)^BEGIN$".r
  private val CommitRe = "(?is)^(?:COMMIT|END)$".r
  private val DeclareRe = "(?is)^DECLARE\\s+(\\S+)\\s+(?:NO\\s+SCROLL\\s+)?CURSOR\\s+FOR\\s+(.+)$".r
  private val FetchRe = "(?is)^FETCH\\s+(?:FORWARD\\s+)?(\\d+)\\s+FROM\\s+(\\S+)$".r
  private val CloseRe = "(?is)^CLOSE\\s+(\\S+)$".r

  private def execute(sql: String, cursors: mutable.Map[String, Cursor])
      : Either[String, (Vector[String], Vector[Int], Vector[Array[String]])] =
    lock.synchronized {
      sql match {
        case BeginRe() => Left("BEGIN")
        case CommitRe() =>
          cursors.clear() // transaction end closes its cursors
          Left("COMMIT")
        case DeclareRe(name, inner) =>
          execute(inner.trim, cursors) match {
            case Right((cols, types, rows)) =>
              cursors(unquoteIdent(name)) = new Cursor(cols, types, rows)
              Left("DECLARE CURSOR")
            case Left(tag) =>
              throw new IllegalArgumentException(s"DECLARE needs a row-returning statement, got $tag")
          }
        case FetchRe(n, name) =>
          val cur = cursors.getOrElse(unquoteIdent(name),
            throw new IllegalArgumentException(s"cursor \"$name\" does not exist"))
          val slice = cur.rows.slice(cur.pos, cur.pos + n.toInt)
          cur.pos += slice.size
          Right((cur.cols, cur.types, slice))
        case CloseRe(name) if cursors.contains(unquoteIdent(name)) =>
          cursors.remove(unquoteIdent(name))
          Left("CLOSE CURSOR")
        case DropRe(name) =>
          tables.remove(unquoteIdent(name)); Left("DROP TABLE")
        case CreateRe(name, colsDef) =>
          val defs = splitTopLevel(colsDef, ',').map(_.trim).filter(_.nonEmpty)
          val (cols, types) = defs.map { d =>
            val (ident, rest) =
              if (d.startsWith("\"")) {
                val end = d.indexOf('"', 1)
                (d.substring(0, end + 1), d.substring(end + 1))
              } else {
                val sp = d.indexOf(' ')
                (d.substring(0, sp), d.substring(sp))
              }
            (unquoteIdent(ident), typeOid(rest))
          }.unzip
          tables(unquoteIdent(name)) =
            Table(cols.toVector, types.toVector, mutable.ArrayBuffer.empty)
          Left("CREATE TABLE")
        case InsertRe(name, colList, valuesPart) =>
          val table = tables(unquoteIdent(name))
          val insertCols = splitTopLevel(colList, ',').map(unquoteIdent)
          require(insertCols == table.cols, s"column mismatch: $insertCols vs ${table.cols}")
          val tuples = parseTuples(valuesPart)
          table.rows ++= tuples
          Left(s"INSERT 0 ${tuples.size}")
        case SelectLimit0Re(name) =>
          val t = tables(unquoteIdent(name))
          Right((t.cols, t.types, Vector.empty))
        case MinMaxRe(colName, name) =>
          val t = tables(unquoteIdent(name))
          val i = t.cols.indexOf(unquoteIdent(colName))
          require(i >= 0, s"no column $colName")
          // real postgres sorts NaN greater than every number, so a double
          // column containing NaN reports max = 'NaN' — reproduce that so
          // the client's finite-bounds validation is exercised hermetically
          val raw = t.rows.flatMap(r => Option(r(i)))
          val hasNaN = raw.exists(_.equalsIgnoreCase("nan"))
          val vals = raw.filterNot(_.equalsIgnoreCase("nan")).map(BigDecimal(_))
          val (mn, mx) =
            if (raw.isEmpty) (null, null)
            else (
              if (vals.isEmpty) "NaN" else vals.min.bigDecimal.toPlainString,
              if (hasNaN) "NaN" else vals.max.bigDecimal.toPlainString)
          Right((Vector("min", "max"), Vector(1700, 1700), Vector(Array(mn, mx))))
        case SelectWhereRe(name, colName, lo, op, hi, orNull) =>
          val t = tables(unquoteIdent(name))
          val i = t.cols.indexOf(unquoteIdent(colName))
          require(i >= 0, s"no column $colName")
          val a = BigDecimal(lo)
          val b = BigDecimal(hi)
          val keepNulls = orNull != null
          val keep = t.rows.filter { r =>
            if (r(i) == null) keepNulls
            else {
              val v = BigDecimal(r(i))
              v >= a && (if (op == "<") v < b else v <= b)
            }
          }
          Right((t.cols, t.types, keep.toVector))
        case SelectAllRe(name) =>
          val t = tables(unquoteIdent(name))
          Right((t.cols, t.types, t.rows.toVector))
        case AlterRe() => Left("ALTER TABLE")
        case SetSridRe(name, colName, srid) =>
          // PostGIS semantics, for real: stamp the EWKB SRID flag + value
          // into the stored hex, so read-back exercises the client's EWKB
          // path instead of silently returning the plain WKB it wrote
          val t = tables(unquoteIdent(name))
          val i = t.cols.indexOf(unquoteIdent(colName))
          require(i >= 0, s"no column $colName")
          val sridInt = srid.toInt
          var n = 0
          t.rows.foreach { r =>
            if (r(i) != null) { r(i) = stampSrid(r(i), sridInt); n += 1 }
          }
          Left(s"UPDATE $n")
        case UpdateRe() =>
          val n = tables.values.map(_.rows.size).sum
          Left(s"UPDATE $n")
        case other => throw new IllegalArgumentException(s"unsupported statement: $other")
      }
    }

  /** Splits on `sep` outside quotes/parens. */
  private def splitTopLevel(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') { cur.append("''"); i += 1 }
        else if (c == '\'') { inQuote = false; cur.append(c) }
        else cur.append(c)
      } else c match {
        case '\'' => inQuote = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => out += cur.toString; cur.setLength(0)
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.length > 0) out += cur.toString
    out.result()
  }

  /** Parses `(v, v, ...), (v, ...)` into rows of nullable strings. */
  private def parseTuples(s: String): Vector[Array[String]] = {
    val tuples = Vector.newBuilder[Array[String]]
    var i = 0
    while (i < s.length) {
      while (i < s.length && s.charAt(i) != '(') i += 1
      if (i < s.length) {
        var depth = 0
        val start = i
        var inQuote = false
        var end = -1
        while (end < 0 && i < s.length) {
          val c = s.charAt(i)
          if (inQuote) {
            if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
            else if (c == '\'') inQuote = false
          } else c match {
            case '\'' => inQuote = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        val inner = s.substring(start + 1, end)
        tuples += splitTopLevel(inner, ',').map(parseLiteral).toArray
      }
    }
    tuples.result()
  }

  /** Rewrites hex WKB to hex EWKB: sets the 0x20000000 flag on the type word
    * and inserts the 4-byte SRID after it (endianness per the header byte).
    * Already-stamped values just update the SRID.
    */
  private def stampSrid(hex: String, srid: Int): String = {
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    if (bytes.length < 5) return hex
    val le = bytes(0) == 1
    val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN
    val buf = java.nio.ByteBuffer.wrap(bytes, 1, 4).order(order)
    val rawType = buf.getInt
    val had = (rawType & 0x20000000) != 0
    val out = java.nio.ByteBuffer
      .allocate(if (had) bytes.length else bytes.length + 4)
      .order(order)
    out.put(bytes(0))
    out.putInt(rawType | 0x20000000)
    out.putInt(srid)
    val tail = if (had) 9 else 5
    out.put(bytes, tail, bytes.length - tail)
    out.array().map(b => f"${b & 0xff}%02x").mkString
  }

  private def parseLiteral(raw: String): String = {
    val v = raw.trim
    if (v.equalsIgnoreCase("NULL")) null
    else if (v.equalsIgnoreCase("TRUE")) "t"
    else if (v.equalsIgnoreCase("FALSE")) "f"
    else if (v.startsWith("'") && v.endsWith("'"))
      v.substring(1, v.length - 1).replace("''", "'")
    else v
  }
}
