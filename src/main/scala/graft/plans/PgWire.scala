package graft.plans

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal PostgreSQL v3 wire-protocol client (simple-query subset).
  *
  * Why this exists: the serving-load chain (reference `README.md:70` —
  * "load it into the real PostGIS database") was REAL end-to-end except
  * for the final Spark→Postgres write, which `df.write.jdbc` can only
  * drive through the `org.postgresql` JDBC jar — absent in the
  * zero-egress sandbox (SCALE.md r18 boundary note). The protocol
  * itself, however, is public and small: startup + trust auth + simple
  * Query messages over TCP (PostgreSQL docs, protocol.sgml). This
  * client implements exactly that subset, so `PostgisLoadJob`'s write
  * leg executes against a genuine server with NO driver jar — one
  * socket per Spark partition, the same one-connection-per-partition
  * shape `df.write.jdbc` uses.
  *
  * Scope is deliberately narrow (the serving-load check, not a general
  * driver): trust authentication only, text-format results, simple
  * Query (no Parse/Bind — parameters are inlined through [[quoteLit]],
  * which is safe here because every value comes from the engine's own
  * typed rows, not user input).
  */
final class PgWire(host: String, port: Int, user: String, db: String)
    extends AutoCloseable {

  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))

  startup()

  private def startup(): Unit = {
    val params = (s"user\u0000$user\u0000database\u0000$db" + "\u0000\u0000").getBytes(UTF_8)
    out.writeInt(8 + params.length)
    out.writeInt(196608) // protocol 3.0
    out.write(params)
    out.flush()
    // drain until ReadyForQuery; trust auth sends AuthenticationOk(0)
    var ready = false
    while (!ready) {
      val (tag, body) = readMessage()
      tag match {
        case 'R' =>
          val code = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
            ((body(2) & 0xff) << 8) | (body(3) & 0xff)
          require(code == 0, s"pgwire: server demands auth code $code — trust auth expected")
        case 'E' => throw new RuntimeException(s"pgwire startup error: ${errorText(body)}")
        case 'Z' => ready = true
        case _   => // ParameterStatus / BackendKeyData / NoticeResponse
      }
    }
  }

  private def readMessage(): (Char, Array[Byte]) = {
    val tag = in.readByte().toChar
    val len = in.readInt()
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    (tag, body)
  }

  private def errorText(body: Array[Byte]): String =
    new String(body, UTF_8).split('\u0000').filter(_.nonEmpty)
      .map(f => f.head match { case 'S' | 'M' | 'C' => f.tail; case _ => "" })
      .filter(_.nonEmpty).mkString(" / ")

  /** Execute one simple-Query message (may carry multiple ;-separated
    * statements) and return the text-format rows of its result sets. */
  def query(sql: String): Seq[Seq[String]] = synchronized {
    val payload = sql.getBytes(UTF_8)
    out.writeByte('Q')
    out.writeInt(4 + payload.length + 1)
    out.write(payload)
    out.writeByte(0)
    out.flush()
    val rows = Seq.newBuilder[Seq[String]]
    var err: String = null
    var ready = false
    while (!ready) {
      val (tag, body) = readMessage()
      tag match {
        case 'D' =>
          val bb = java.nio.ByteBuffer.wrap(body)
          val n = bb.getShort().toInt
          rows += (0 until n).map { _ =>
            val l = bb.getInt()
            if (l < 0) null
            else { val v = new Array[Byte](l); bb.get(v); new String(v, UTF_8) }
          }
        case 'E' => err = errorText(body)
        case 'Z' => ready = true
        case _   => // RowDescription / CommandComplete / Notice / Empty
      }
    }
    if (err != null) throw new RuntimeException(s"pgwire: $err\n  on: ${sql.take(300)}")
    rows.result()
  }

  /** Statements where no result rows are expected. */
  def exec(sql: String): Unit = { query(sql); () }

  override def close(): Unit = {
    try { out.writeByte('X'); out.writeInt(4); out.flush() } catch { case _: Throwable => }
    sock.close()
  }
}

object PgWire {
  /** SQL string literal with standard-conforming escaping. */
  def quoteLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** bytea hex literal. */
  def byteaLit(b: Array[Byte]): String =
    "'\\x" + b.map("%02x".format(_)).mkString + "'::bytea"
}
