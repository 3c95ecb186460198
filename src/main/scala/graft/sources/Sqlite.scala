package graft.sources

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.model.{ColumnDef, ForeignKey, RelationalCatalog, TableDef}

/** Native SQLite 3 file reader — tables + full PK/FK catalog from a
  * `.sqlite` file, with no JDBC driver dependency.
  *
  * This is the engine's ingest analogue of the reference's primary input
  * path: it accepts an uploaded SQLite database, discovers tables from
  * `sqlite_master`, and introspects columns/PKs/FKs (reference:
  * final/app.py:45-55, final/sqlite_to_csv.py:25-38, final/erd_text.py:20-47
  * — there via `sqlite3` + PRAGMAs; here by reading the file format
  * directly, per the published SQLite database file format: 100-byte
  * header, table b-trees of interior (0x05) and leaf (0x0D) pages, record
  * serial types, and overflow-page chains).
  *
  * Scale posture: SQLite files are single-writer, megabyte-to-gigabyte
  * artifacts; parsing happens driver-side (as the reference's pandas read
  * does) and rows are then parallelized into a DataFrame. For many
  * uploaded databases, parallelize across FILES, not within one.
  *
  * Unsupported (rejected with clear errors): WITHOUT ROWID tables,
  * non-UTF-8 text encodings.
  */
object Sqlite {

  // ------------------------------------------------------------ file level

  private final class Db(bytes: Array[Byte]) {
    require(bytes.length >= 100 &&
      new String(bytes, 0, 16, "ISO-8859-1").startsWith("SQLite format 3"),
      "not a SQLite 3 database file")
    private def u8(off: Int): Int = bytes(off) & 0xff
    private def u16(off: Int): Int = (u8(off) << 8) | u8(off + 1)
    private def u32(off: Int): Long = (u16(off).toLong << 16) | u16(off + 2)

    val pageSize: Int = { val p = u16(16); if (p == 1) 65536 else p }
    private val reserved = u8(20)
    val usable: Int = pageSize - reserved
    require(u32(56) == 1 || u32(56) == 0, "only UTF-8 text encoding is supported")

    private def pageOff(page: Int): Int = (page - 1) * pageSize

    /** (value, bytesRead) big-endian 7-bit varint, 9th byte full width. */
    private def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = u8(off + i)
        if ((b & 0x80) == 0) return ((v << 7) | b, i + 1)
        v = (v << 7) | (b & 0x7f)
        i += 1
      }
      (((v << 8) | u8(off + 8)), 9)
    }

    /** Full cell payload, following the overflow chain when present. */
    private def payload(cellOff: Int, payloadLen: Long, afterHeader: Int): Array[Byte] = {
      val p = payloadLen.toInt
      val x = usable - 35
      if (p <= x) java.util.Arrays.copyOfRange(bytes, afterHeader, afterHeader + p)
      else {
        val m = ((usable - 12) * 32 / 255) - 23
        val k = m + ((p - m) % (usable - 4))
        val local = if (k <= x) k else m
        val out = new Array[Byte](p)
        System.arraycopy(bytes, afterHeader, out, 0, local)
        var written = local
        var next = u32(afterHeader + local).toInt
        while (next != 0 && written < p) {
          val off = pageOff(next)
          val chunk = math.min(usable - 4, p - written)
          System.arraycopy(bytes, off + 4, out, written, chunk)
          written += chunk
          next = u32(off).toInt
        }
        out
      }
    }

    /** Walk a table b-tree; emit (rowid, record bytes). */
    def walk(rootPage: Int): Iterator[(Long, Array[Byte])] = {
      val base = pageOff(rootPage)
      val hdr = base + (if (rootPage == 1) 100 else 0)
      u8(hdr) match {
        case 0x0d => // leaf
          val nCells = u16(hdr + 3)
          val ptrs = hdr + 8
          (0 until nCells).iterator.map { i =>
            val cell = base + u16(ptrs + 2 * i)
            val (plen, n1) = varint(cell)
            val (rowid, n2) = varint(cell + n1)
            (rowid, payload(cell, plen, cell + n1 + n2))
          }
        case 0x05 => // interior
          val nCells = u16(hdr + 3)
          val ptrs = hdr + 12
          val children = (0 until nCells).map(i => u32(base + u16(ptrs + 2 * i)).toInt) :+
            u32(hdr + 8).toInt
          children.iterator.flatMap(walk)
        case 0x02 | 0x0a =>
          throw new IllegalArgumentException(
            "index b-tree where table expected (WITHOUT ROWID tables are not supported)")
        case t => throw new IllegalArgumentException(f"unknown page type 0x$t%02x")
      }
    }

    /** Decode a record into column values (Long/Double/String/Array[Byte]/null). */
    def record(rec: Array[Byte]): Array[Any] = {
      def rvarint(off: Int): (Long, Int) = {
        var v = 0L
        var i = 0
        while (i < 8) {
          val b = rec(off + i) & 0xff
          if ((b & 0x80) == 0) return ((v << 7) | b, i + 1)
          v = (v << 7) | (b & 0x7f)
          i += 1
        }
        (((v << 8) | (rec(off + 8) & 0xff)), 9)
      }
      val (hlen, n0) = rvarint(0)
      var off = n0
      val types = scala.collection.mutable.ArrayBuffer[Long]()
      while (off < hlen) {
        val (t, n) = rvarint(off)
        types += t
        off += n
      }
      var body = hlen.toInt
      def intN(n: Int): Long = {
        var v = if ((rec(body) & 0x80) != 0) -1L else 0L
        (0 until n).foreach(i => v = (v << 8) | (rec(body + i) & 0xff))
        v
      }
      types.map { t =>
        val (value, size): (Any, Int) = t match {
          case 0 => (null, 0)
          case 1 => (intN(1), 1)
          case 2 => (intN(2), 2)
          case 3 => (intN(3), 3)
          case 4 => (intN(4), 4)
          case 5 => (intN(6), 6)
          case 6 => (intN(8), 8)
          case 7 => (java.lang.Double.longBitsToDouble(intN(8)), 8)
          case 8 => (0L, 0)
          case 9 => (1L, 0)
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            (new String(rec, body, len, "UTF-8"), len)
          case n if n >= 12 =>
            val len = ((n - 12) / 2).toInt
            (java.util.Arrays.copyOfRange(rec, body, body + len), len)
          case n => throw new IllegalArgumentException(s"reserved serial type $n")
        }
        body += size
        value
      }.toArray
    }
  }

  // --------------------------------------------------------- DDL parsing

  private def unquote(s: String): String = {
    val t = s.trim
    if ((t.startsWith("\"") && t.endsWith("\"")) || (t.startsWith("`") && t.endsWith("`")))
      t.substring(1, t.length - 1)
    else if (t.startsWith("[") && t.endsWith("]")) t.substring(1, t.length - 1)
    else t
  }

  /** Split on top-level commas (ignoring commas inside parentheses). */
  private def topLevel(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val fkRe =
    """(?is)FOREIGN\s+KEY\s*\(([^)]*)\)\s*REFERENCES\s+([\w"\[\]`]+)\s*\(([^)]*)\).*""".r
  private val pkRe = """(?is)PRIMARY\s+KEY\s*\(([^)]*)\).*""".r
  private val colRefRe = """(?is).*REFERENCES\s+([\w"\[\]`]+)\s*\(([^)]*)\).*""".r

  /** Parse one `CREATE TABLE` statement into catalog metadata. */
  def parseCreateTable(sql: String): TableDef = {
    val open = sql.indexOf('(')
    val close = sql.lastIndexOf(')')
    require(open > 0 && close > open, s"cannot parse DDL: $sql")
    val name = unquote(sql.substring(0, open).trim
      .replaceAll("(?is)^CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?", "").trim)
    val cols = Seq.newBuilder[ColumnDef]
    var pks = Seq.empty[String]
    val fks = Seq.newBuilder[ForeignKey]
    topLevel(sql.substring(open + 1, close)).foreach { item =>
      val stripped = item.replaceAll("(?is)^CONSTRAINT\\s+[\\w\"\\[\\]`]+\\s+", "")
      val upper = stripped.toUpperCase
      if (upper.startsWith("FOREIGN KEY")) stripped match {
        case fkRe(from, table, to) =>
          from.split(",").map(unquote).zip(to.split(",").map(unquote)).foreach {
            case (f, t) => fks += ForeignKey(f.trim, unquote(table), t.trim)
          }
        case _ => // unparseable FK clause: skip rather than fail the table
      }
      else if (upper.startsWith("PRIMARY KEY")) stripped match {
        case pkRe(inner) => pks = inner.split(",").map(c => unquote(c.trim.split("\\s+")(0))).toSeq
        case _ =>
      }
      else if (upper.startsWith("UNIQUE") || upper.startsWith("CHECK")) ()
      else {
        val tokens = stripped.split("\\s+", 2)
        val colName = unquote(tokens(0))
        val rest = if (tokens.length > 1) tokens(1) else ""
        val restUpper = rest.toUpperCase
        val typeEnd = Seq("PRIMARY KEY", "NOT NULL", "UNIQUE", "DEFAULT",
          "REFERENCES", "CHECK", "COLLATE", "GENERATED")
          .map(restUpper.indexOf).filter(_ >= 0).sorted.headOption.getOrElse(rest.length)
        cols += ColumnDef(colName, rest.substring(0, typeEnd).trim)
        if (restUpper.contains("PRIMARY KEY") && pks.isEmpty) pks = Seq(colName)
        rest match {
          case colRefRe(table, to) => fks += ForeignKey(colName, unquote(table), unquote(to.trim))
          case _ =>
        }
      }
    }
    TableDef(name, cols.result(), pks, fks.result())
  }

  // ----------------------------------------------------------- public API

  /** `skipped`: tables the reader cannot decode (e.g. WITHOUT ROWID),
    * with reasons — one bad table must not sink the whole upload.
    */
  final case class Database(
      catalog: RelationalCatalog,
      tables: Map[String, DataFrame],
      skipped: Map[String, String] = Map.empty)

  /** Read every table of a SQLite file into DataFrames typed by declared
    * affinity (INT→long, REAL/DECIMAL→double, BLOB→binary, else string;
    * mixed-affinity values are coerced, parse-failure→null — the same
    * coerce rules as the CSV path, reference: final/sqlite_to_csv.py:44-59).
    * An `INTEGER PRIMARY KEY` column is a rowid alias — its record value is
    * NULL and the b-tree rowid is the actual value.
    */
  def read(spark: SparkSession, path: String): Database = {
    val db = new Db(Files.readAllBytes(Paths.get(path)))
    // sqlite_master: page 1; columns (type, name, tbl_name, rootpage, sql)
    val master = db.walk(1).map { case (_, rec) => db.record(rec) }.collect {
      case Array(t: String, name: String, _, rootpage: Long, sql: String)
          if t == "table" && !name.startsWith("sqlite_") =>
        (name, rootpage.toInt, sql)
    }.toSeq
    // CREATE VIRTUAL TABLE rows are type='table' in sqlite_master but have
    // no b-tree of their own (rootpage 0) and module-specific DDL —
    // walking rootpage 0 would compute a negative page offset, and
    // parseCreateTable would mis-read the module args as columns. Skip
    // them up front with a reason (their real shadow tables still read).
    val (virtualTables, realTables) = master.partition { case (_, rootpage, sql) =>
      rootpage < 1 ||
        sql.replaceAll("\\s+", " ").trim.toUpperCase.startsWith("CREATE VIRTUAL TABLE")
    }
    // DDL parsing is per-table fallible too — one exotic CREATE TABLE must
    // not sink the whole upload (same contract as the page-walk below)
    val parsed = realTables.map { case (name, rootpage, sql) =>
      try Right((name, rootpage, parseCreateTable(sql)))
      catch { case NonFatal(e) => Left(name -> s"DDL parse failed: $e") }
    }
    val catalog = RelationalCatalog(parsed.collect { case Right((_, _, td)) => td })

    val attempts = parsed.collect { case Right((name, rootpage, td)) =>
      val rowidAlias: Option[Int] = td.columns.zipWithIndex.collectFirst {
        case (c, i) if td.primaryKeys == Seq(c.name) &&
          c.sqlType.toUpperCase.trim == "INTEGER" => i
      }
      def affinity(t: String): DataType = {
        // must mirror Csv.normalize's declared-type mapping exactly (INT and
        // NUMERIC → long; DEC/REAL/FLOA/DOUB → double) so a database read
        // directly and its CSV export produce identical schemas
        val u = t.toUpperCase
        if (u.contains("INT") || u.contains("NUMERIC")) LongType
        else if (u.contains("DEC") || u.contains("REAL") || u.contains("FLOA") ||
          u.contains("DOUB")) DoubleType
        else if (u.contains("BLOB")) BinaryType
        else StringType
      }
      val schema = StructType(td.columns.map(c => StructField(c.name, affinity(c.sqlType))))
      def coerce(v: Any, dt: DataType): Any = (v, dt) match {
        case (null, _) => null
        case (l: Long, LongType) => l
        case (d: Double, LongType) => if (d == d.toLong.toDouble) d.toLong else null
        case (s: String, LongType) => s.trim.toLongOption.orNull
        case (l: Long, DoubleType) => l.toDouble
        case (d: Double, DoubleType) => d
        case (s: String, DoubleType) => s.trim.toDoubleOption.orNull
        case (b: Array[Byte], BinaryType) => b
        case (s: String, StringType) => s
        case (l: Long, StringType) => l.toString
        case (d: Double, StringType) => d.toString
        case (b: Array[Byte], StringType) => new String(b, "UTF-8")
        case _ => null
      }
      try {
        val rows = db.walk(rootpage).map { case (rowid, rec) =>
          val vals = db.record(rec)
          val padded = td.columns.indices.map { i =>
            val raw =
              if (rowidAlias.contains(i)) rowid
              else if (i < vals.length) vals(i)
              else null
            coerce(raw, schema(i).dataType)
          }
          Row.fromSeq(padded)
        }.toSeq
        Right(name -> spark.createDataFrame(
          spark.sparkContext.parallelize(rows, math.max(1, rows.size / 50000)), schema))
      } catch {
        // NonFatal, not just IllegalArgumentException: corrupt pages can
        // surface as ArrayIndexOutOfBounds etc. — degrade to a skipped
        // table, never a failed upload
        case NonFatal(e) => Left(name -> e.toString)
      }
    }
    Database(catalog,
      attempts.collect { case Right(t) => t }.toMap,
      attempts.collect { case Left(s) => s }.toMap ++
        parsed.collect { case Left(s) => s }.toMap ++
        virtualTables.map { case (name, _, _) =>
          name -> "virtual table (no b-tree payload; shadow tables read separately)"
        }.toMap)
  }
}
