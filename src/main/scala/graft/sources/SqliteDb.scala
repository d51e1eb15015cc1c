package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Generic SQLite table driver — the non-spatial twin of the GeoPackage
  * driver, sharing its from-scratch pager/B-tree/record codec (a GeoPackage
  * IS a SQLite database; reference: the SQLite file-format spec at
  * sqlite.org/fileformat2.html, re-implemented here — no SQLite library
  * involved). SQLite files are the lingua franca of scraped-data drops,
  * app exports, and annotation tools, which makes "read the .db straight
  * into a DataFrame" a real ingestion verb for a training-data pipeline.
  *
  * Scale shape: one file = one task (`binaryFile` source, the Gpkg model) —
  * SQLite's page graph is not byte-splittable, so parallelism comes from
  * MANY files ([[writeSharded]] emits one complete .sqlite per partition,
  * and a directory of shards reads back as one frame). Column projection
  * skips unrequested cells at the record-decode cursor, exactly like the
  * gpkg `columns:` path.
  *
  * Type mapping (declared affinity → Spark): INTEGER family → long, REAL
  * family → double, TEXT/VARCHAR/DATE → string, everything else → binary.
  * SQLite cells are dynamically typed, so stray values coerce when lossless
  * (int ↔ real widening, number → declared-TEXT as decimal string) and
  * fail loudly otherwise. An `INTEGER PRIMARY KEY` column is SQLite's rowid
  * alias: its cells are stored NULL and materialize from the rowid.
  */
object SqliteDb {

  /** User tables (sqlite_* internals and gpkg metadata excluded) of the
    * FIRST file matched by `path` — the `:table` address book for
    * [[read]], mirroring `Gpkg.layers`.
    */
  def tables(spark: SparkSession, path: String): Seq[String] = {
    import spark.implicits._
    val head = binaryFiles(spark, path).head()
    new Gpkg.Sqlite(head).master
      .filter(m => m._1 == "table" && !m._2.startsWith("sqlite_"))
      .map(_._2)
  }

  private def binaryFiles(spark: SparkSession, path: String) = {
    import spark.implicits._
    val f = spark.read.format("binaryFile")
    val lower = path.toLowerCase
    val reader =
      if (lower.endsWith(".sqlite") || lower.endsWith(".db") || lower.endsWith(".sqlite3")) f
      else f.option("pathGlobFilter", "*.sqlite")
    reader.load(path).select("content").as[Array[Byte]]
  }

  /** Reads one table (explicit name, or the only user table) from every
    * matched file as a DataFrame. `columns` projects at the record cursor —
    * unrequested cells are never decoded.
    */
  def read(spark: SparkSession, path: String, table: Option[String] = None,
      columns: Seq[String] = Nil): DataFrame = {
    val files = binaryFiles(spark, path)
    val head = files.head()
    val db = new Gpkg.Sqlite(head)
    val user = db.master.filter(m => m._1 == "table" && !m._2.startsWith("sqlite_"))
    require(user.nonEmpty, s"no user tables in $path")
    val tableName = table.getOrElse {
      require(user.size == 1,
        s"multiple tables ${user.map(_._2).sorted.mkString(", ")} — pass table= or a path:table suffix")
      user.head._2
    }
    val masterRow = user.find(_._2 == tableName).getOrElse(throw new IllegalArgumentException(
      s"table $tableName not in $path (has ${user.map(_._2).sorted.mkString(", ")})"))
    val cols = Gpkg.parseColumns(masterRow._5)

    val missing = columns.toSet -- cols.map(_._1).toSet
    require(missing.isEmpty, s"columns not in table $tableName: ${missing.toSeq.sorted.mkString(", ")}")
    val selected: Array[Int] =
      if (columns.isEmpty) cols.indices.toArray
      else cols.zipWithIndex.collect { case ((n, _), i) if columns.contains(n) => i }.toArray
    val keep: Array[Boolean] =
      if (columns.isEmpty) null
      else {
        val k = Array.fill(cols.length)(false)
        selected.foreach(k(_) = true)
        k
      }

    val schema = StructType(selected.toIndexedSeq.map { i =>
      val (n, decl) = cols(i)
      StructField(n, Gpkg.sparkType(decl))
    })
    val enc = RowEncoder.encoderFor(schema)
    val colDecls = cols.toArray
    val rowidAlias = cols.indexWhere { case (_, d) => d.contains("INTEGER PRIMARY KEY") }

    files.mapPartitions { it =>
      it.flatMap { fileBytes =>
        val fdb = new Gpkg.Sqlite(fileBytes)
        val root = fdb.master.find(m => m._1 == "table" && m._2 == tableName)
          .getOrElse(throw new IllegalArgumentException(
            s"table $tableName missing from a shard"))._4
        fdb.table(root, keep).map { case (rowid, vals) =>
          val out = selected.map { i =>
            val (_, decl) = colDecls(i)
            val v = if (i < vals.length) vals(i) else null
            if (v == null && i == rowidAlias) rowid
            else (Gpkg.sparkType(decl), v) match {
              case (_, null) => null
              case (LongType, l: Long) => l
              case (DoubleType, d: Double) => d
              case (DoubleType, l: Long) => l.toDouble // lossless int-in-REAL cell
              case (StringType, s: String) => s
              case (StringType, l: Long) => l.toString // dynamic cell in a TEXT column
              case (StringType, d: Double) => d.toString
              case (BinaryType, b: Array[Byte]) => b
              case (BinaryType, s: String) => s.getBytes(StandardCharsets.UTF_8)
              case (t, x) => throw new IllegalArgumentException(
                s"sqlite cell ${x.getClass.getSimpleName} does not fit declared $t " +
                  s"in table $tableName")
            }
          }
          Row.fromSeq(out.toSeq)
        }
      }
    }(enc)
  }

  private def sqlOf(table: String, schema: StructType): String = {
    def quoted(s: String) = "\"" + s + "\""
    val cols = schema.fields.map(f => s"${quoted(f.name)} ${Gpkg.declType(f.dataType)}")
    s"CREATE TABLE ${quoted(table)} (${cols.mkString(", ")})"
  }

  private def buildFile(tablesIn: Seq[(String, StructType, IndexedSeq[Row])],
      path: String): Unit = {
    require(tablesIn.map(_._1).distinct.size == tablesIn.size,
      s"duplicate table names: ${tablesIn.map(_._1).mkString(", ")}")
    val b = new Gpkg.SqliteBuilder()
    val built = tablesIn.map { case (name, schema, rows) =>
      val recs = rows.zipWithIndex.map { case (r, i) =>
        ((i + 1).toLong, schema.fields.indices.map(r.get))
      }
      (name, b.writeTable(recs), sqlOf(name, schema))
    }
    val master = built.zipWithIndex.map { case ((name, root, sql), i) =>
      ((i + 1).toLong, Seq[Any]("table", name, name, root.toLong, sql))
    }
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try b.finish(master, out, applicationId = 0, userVersion = 0)
    finally out.close()
  }

  /** Single-file write (driver-side collect, `maxRows`-capped — use
    * [[writeSharded]] for large frames). One table per call; see
    * [[writeTables]] for several.
    */
  def write(df: DataFrame, path: String, table: String = "data",
      maxRows: Int = 1000000): Unit =
    writeTables(Seq(table -> df), path, maxRows)

  /** Multi-table single-file write — the `.db` hand-off format many
    * annotation and labeling tools expect.
    */
  def writeTables(tablesIn: Seq[(String, DataFrame)], path: String,
      maxRows: Int = 1000000): Unit = {
    require(tablesIn.nonEmpty, "writeTables needs at least one table")
    val collected = tablesIn.map { case (name, df) =>
      val rows = df.limit(maxRows + 1).collect()
      require(rows.length <= maxRows,
        s"SqliteDb.write collects to the driver and is capped at maxRows=$maxRows rows; " +
          "use writeSharded (one .sqlite per partition) for large frames")
      (name, df.schema, rows.toIndexedSeq)
    }
    buildFile(collected, path)
  }

  /** Distributed multi-file write — one complete `part-NNNNN.sqlite` per
    * non-empty partition under `dir`, each a standalone valid SQLite
    * database for external tools; [[read]] pointed at `dir` consumes the
    * shard set back as one frame. No driver collect, no row cap. Task
    * retries rewrite their own shard idempotently.
    */
  def writeSharded(df: DataFrame, dir: String, table: String = "data"): Unit = {
    val schema = df.schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val counts = df.rdd.mapPartitionsWithIndex { (i, it) =>
      val rows = it.toIndexedSeq
      if (rows.isEmpty) Iterator.empty
      else {
        buildFile(Seq((table, schema, rows)),
          new java.io.File(dir, f"part-$i%05d.sqlite").getPath)
        Iterator.single(rows.length.toLong)
      }
    }.collect() // bounded: one count per shard
    // an all-empty frame still yields one schema-bearing shard
    if (counts.isEmpty)
      buildFile(Seq((table, schema, IndexedSeq.empty[Row])),
        new java.io.File(dir, "part-00000.sqlite").getPath)
  }
}
