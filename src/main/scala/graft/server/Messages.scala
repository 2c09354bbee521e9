package graft.server

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** MySQL wire message payloads (/root/reference/src/mysql/message.rs:1).
  * Same packet shapes as the reference server: protocol-10 handshake
  * advertising mysql_native_password, auth-switch, OK/ERR/EOF, text
  * result sets (column count → ColumnDefinition41s → EOF → text rows →
  * EOF).
  */
object Messages {

  private def buf() = new ByteArrayOutputStream(64)

  /** Initial handshake: protocol 10, server version, 20-byte auth plugin
    * data, CLIENT_PROTOCOL_41 | CLIENT_PLUGIN_AUTH capabilities
    * (message.rs:110 handshark_message — same fixed salt). Unlike the
    * reference (handle.rs accepts any credentials), the server verifies
    * the auth-switch response against mysql.user (MysqlServer
    * .authenticate) — the scramble clients must answer is
    * `authSwitchSalt`, since the auth-switch supersedes this salt.
    */
  def handshake(connectionId: Int): Array[Byte] = {
    val b = buf()
    b.write(10)
    b.write("8.0.25".getBytes("UTF-8")); b.write(0)
    Lenc.u32(b, connectionId.toLong)
    b.write(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 0, 8); b.write(0)
    // capability lower bytes: LONG_PASSWORD|FOUND_ROWS|..|PROTOCOL_41
    b.write(0xff); b.write(0xf7)
    b.write(46) // charset utf8mb4_bin
    Lenc.u16(b, 0x0002) // status: autocommit
    // capability upper bytes: MULTI_STATEMENTS|MULTI_RESULTS|PLUGIN_AUTH
    // (0x1b) + CLIENT_DEPRECATE_EOF (1<<24 → 0x0100 here, round 14):
    // modern drivers negotiate it and expect result sets terminated by
    // an OK-with-EOF-header instead of bare EOF packets
    b.write(0x1b); b.write(0x01)
    b.write(0x15) // auth-plugin-data length
    (0 until 10).foreach(_ => b.write(0))
    b.write(Array[Byte](9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20), 0, 12)
    b.write(0)
    b.write("mysql_native_password".getBytes("UTF-8")); b.write(0)
    b.toByteArray
  }

  /** The 20-byte nonce the auth-switch request carries — clients scramble
    * their password against THIS salt (it supersedes the handshake's),
    * and the server verifies against it (MysqlServer.authenticate).
    */
  val authSwitchSalt: Array[Byte] = (1 to 20).map(_.toByte).toArray

  /** Auth switch request (message.rs:96): 0xfe + plugin + salt. */
  def authSwitch(): Array[Byte] = {
    val b = buf()
    b.write(0xfe)
    b.write("mysql_native_password".getBytes("UTF-8")); b.write(0)
    b.write(authSwitchSalt, 0, authSwitchSalt.length)
    b.write(0)
    b.toByteArray
  }

  /** LOCAL INFILE request (protocol 0xFB + filename as EOF string): the
    * server's answer to `LOAD DATA LOCAL INFILE` asking the CLIENT to
    * stream the named file's content as packets, terminated by an empty
    * packet. CLIENT_LOCAL_FILES is advertised in the handshake's low
    * capability byte.
    */
  def localInfileRequest(fileName: String): Array[Byte] = {
    val b = buf()
    b.write(0xfb)
    b.write(fileName.getBytes("UTF-8"))
    b.toByteArray
  }

  /** `moreResults` sets SERVER_MORE_RESULTS_EXISTS (0x0008): in a
    * multi-statement COM_QUERY every result but the last carries it, so
    * the client keeps reading result sets.
    */
  def ok(affectedRows: Long, lastInsertId: Long = 0,
         message: String = "", moreResults: Boolean = false): Array[Byte] = {
    val b = buf()
    b.write(0x00)
    Lenc.int(b, affectedRows)
    Lenc.int(b, lastInsertId)
    Lenc.u16(b, 0x0002 | (if (moreResults) 0x0008 else 0)) // AUTOCOMMIT [| MORE_RESULTS]
    Lenc.u16(b, 0)      // warnings
    if (message.nonEmpty) Lenc.str(b, message)
    b.toByteArray
  }

  def err(code: Int, sqlState: String, message: String): Array[Byte] = {
    val b = buf()
    b.write(0xff)
    Lenc.u16(b, code)
    b.write('#')
    b.write(sqlState.getBytes("UTF-8"), 0, 5)
    b.write(message.getBytes("UTF-8"))
    b.toByteArray
  }

  def eof(moreResults: Boolean = false): Array[Byte] = {
    val b = buf()
    b.write(0xfe); Lenc.u16(b, 0)
    Lenc.u16(b, 0x0002 | (if (moreResults) 0x0008 else 0))
    b.toByteArray
  }

  /** OK packet with the 0xFE (EOF) header — the result-set terminator
    * under CLIENT_DEPRECATE_EOF (MySQL 5.7.5+): same body as ok(), the
    * EOF header byte keeps row loops that key on 0xFE stopping. Status
    * flags land at the same offsets as legacy EOF's (both lencs are one
    * byte), which is why drivers can share the parse.
    */
  def okEof(moreResults: Boolean = false): Array[Byte] = {
    val b = buf()
    b.write(0xfe)
    Lenc.int(b, 0L) // affected rows
    Lenc.int(b, 0L) // last insert id
    Lenc.u16(b, 0x0002 | (if (moreResults) 0x0008 else 0))
    Lenc.u16(b, 0) // warnings
    b.toByteArray
  }

  def columnCount(n: Int): Array[Byte] = {
    val b = buf(); Lenc.int(b, n.toLong); b.toByteArray
  }

  /** COM_STMT_PREPARE first response (message.rs:13). */
  def stmtPrepareOk(stmtId: Int, numColumns: Int, numParams: Int): Array[Byte] = {
    val b = buf()
    b.write(0x00)
    Lenc.u32(b, stmtId.toLong)
    Lenc.u16(b, numColumns)
    Lenc.u16(b, numParams)
    b.write(0x00)
    Lenc.u16(b, 0) // warnings
    b.toByteArray
  }

  // ---- column metadata ----------------------------------------------------

  /** MySQL protocol type codes (mysql_type_code.rs parity + the standard
    * temporal codes the reference never sends).
    */
  def mysqlTypeCode(dt: DataType): Int = dt match {
    case BooleanType | ByteType => 0x01 // TINY
    case ShortType              => 0x02 // SHORT
    case IntegerType            => 0x03 // LONG
    case LongType               => 0x08 // LONGLONG
    case FloatType              => 0x04 // FLOAT
    case DoubleType             => 0x05 // DOUBLE
    case _: DecimalType         => 0xf6 // NEWDECIMAL
    case DateType               => 0x0a // DATE
    case TimestampType | TimestampNTZType => 0x0c // DATETIME
    case BinaryType             => 0xfc // BLOB
    case _                      => 0xfd // VAR_STRING
  }

  /** ColumnDefinition41 (metadata.rs Column::to_response_payload):
    * catalog "def", schema, table×2, name×2, fixed-length block with
    * charset/length/type/flags/decimals.
    */
  def columnDef(schema: String, table: String, name: String,
                dt: DataType, nullable: Boolean): Array[Byte] = {
    val b = buf()
    Lenc.str(b, "def")
    Lenc.str(b, schema)
    Lenc.str(b, table); Lenc.str(b, table)
    Lenc.str(b, name); Lenc.str(b, name)
    b.write(0x0c) // length of fixed fields
    Lenc.u16(b, 46) // charset utf8mb4_bin (metadata.rs:80)
    Lenc.u32(b, 0x100000L) // column display length
    b.write(mysqlTypeCode(dt))
    Lenc.u16(b, if (nullable) 0x0000 else 0x0001) // NOT_NULL_FLAG
    b.write(dt match {
      case d: DecimalType => d.scale
      case FloatType | DoubleType => 0x1f
      case _ => 0x00
    })
    Lenc.u16(b, 0) // filler
    b.toByteArray
  }

  // ---- text rows ----------------------------------------------------------

  private val tsFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** One value in the text protocol, matching the MySQL client's
    * expectations: numbers/strings verbatim, booleans as 1/0, temporals
    * in MySQL literal format, NULL as 0xfb (response.rs dump_text_row).
    */
  def cellText(v: Any): Either[Unit, Array[Byte]] = v match {
    case null                  => Left(())
    case s: String             => Right(s.getBytes("UTF-8"))
    case b: Boolean            => Right(if (b) Array('1'.toByte) else Array('0'.toByte))
    case b: Array[Byte]        => Right(b)
    case d: java.math.BigDecimal => Right(d.toPlainString.getBytes("UTF-8"))
    case d: BigDecimal         => Right(d.bigDecimal.toPlainString.getBytes("UTF-8"))
    case d: java.sql.Date      => Right(d.toString.getBytes("UTF-8"))
    case d: java.time.LocalDate => Right(d.toString.getBytes("UTF-8"))
    case t: java.sql.Timestamp =>
      Right(tsFormat.format(t.toLocalDateTime).getBytes("UTF-8"))
    case t: java.time.LocalDateTime => Right(tsFormat.format(t).getBytes("UTF-8"))
    case t: java.time.Instant =>
      Right(tsFormat.format(java.time.LocalDateTime.ofInstant(t,
        java.time.ZoneOffset.UTC)).getBytes("UTF-8"))
    case other                 => Right(other.toString.getBytes("UTF-8"))
  }

  def textRow(row: Row): Array[Byte] = {
    val b = new ByteArrayOutputStream(256)
    var i = 0
    while (i < row.length) {
      cellText(row.get(i)) match {
        case Left(_)      => Lenc.nul(b)
        case Right(bytes) => Lenc.bytes(b, bytes)
      }
      i += 1
    }
    b.toByteArray
  }

  // ---- binary rows (COM_STMT_EXECUTE result sets) -------------------------

  /** One row in the binary protocol: 0x00 header, NULL bitmap with the
    * protocol's 2-bit offset, then each non-null value encoded per the
    * COLUMN'S advertised wire type (so the client decodes with the codes
    * from our ColumnDefinition41s). This is the part of the protocol the
    * reference skips — handle.rs answers COM_STMT_EXECUTE with text rows;
    * real clients (Connector/J, mysql CLI) expect binary.
    */
  def binaryRow(row: Row, schema: StructType): Array[Byte] = {
    val n = schema.length
    val b = new ByteArrayOutputStream(256)
    b.write(0x00)
    val bitmap = new Array[Byte]((n + 7 + 2) / 8)
    var i = 0
    while (i < n) {
      if (row.isNullAt(i)) {
        val bit = i + 2
        bitmap(bit / 8) = (bitmap(bit / 8) | (1 << (bit % 8))).toByte
      }
      i += 1
    }
    b.write(bitmap, 0, bitmap.length)
    i = 0
    while (i < n) {
      if (!row.isNullAt(i)) binaryCell(b, row.get(i), schema(i).dataType)
      i += 1
    }
    b.toByteArray
  }

  /** Dispatch on the declared DataType, not the runtime class, so the
    * encoding always agrees with `mysqlTypeCode` in the column metadata.
    */
  private def binaryCell(b: ByteArrayOutputStream, v: Any, dt: DataType): Unit =
    dt match {
      case BooleanType => b.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case ByteType    => b.write(v.asInstanceOf[Byte].toInt)
      case ShortType   => Lenc.u16(b, v.asInstanceOf[Short] & 0xffff)
      case IntegerType => Lenc.u32(b, v.asInstanceOf[Int] & 0xffffffffL)
      case LongType    => Lenc.u64(b, v.asInstanceOf[Long])
      case FloatType   =>
        Lenc.u32(b, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]) & 0xffffffffL)
      case DoubleType  =>
        Lenc.u64(b, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case DateType =>
        val d = v match {
          case d: java.sql.Date       => d.toLocalDate
          case d: java.time.LocalDate => d
        }
        b.write(4)
        Lenc.u16(b, d.getYear); b.write(d.getMonthValue); b.write(d.getDayOfMonth)
      case TimestampType | TimestampNTZType =>
        val t = v match {
          case t: java.sql.Timestamp      => t.toLocalDateTime
          case t: java.time.LocalDateTime => t
          case t: java.time.Instant =>
            java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC)
        }
        val micros = t.getNano / 1000
        b.write(if (micros != 0) 11 else 7)
        Lenc.u16(b, t.getYear); b.write(t.getMonthValue); b.write(t.getDayOfMonth)
        b.write(t.getHour); b.write(t.getMinute); b.write(t.getSecond)
        if (micros != 0) Lenc.u32(b, micros.toLong)
      case _ =>
        // NEWDECIMAL, VAR_STRING, BLOB, and complex types all travel as
        // length-encoded bytes of their text form in the binary protocol
        cellText(v) match {
          case Right(bytes) => Lenc.bytes(b, bytes)
          case Left(_)      => Lenc.nul(b) // unreachable: caller checked null
        }
    }
}
