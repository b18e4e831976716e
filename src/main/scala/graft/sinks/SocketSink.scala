package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket

import org.apache.spark.sql.{ForeachWriter, Row}

/** K3 TCPWriter / K4 RPCWriter (`tunnel/tcp_writer.go:156-260`,
  * `tunnel/rpc_writer.go:21-87`): socket sinks for framed TMessages,
  * driven per partition by Structured Streaming's `foreach` — one
  * connection per partition per epoch, frames length-prefixed on the
  * wire.
  *
  * K3 is fire-and-forget (ack handled out-of-band by the engine's
  * checkpointing); K4 writes a frame and blocks for the receiver's 8-byte
  * ack (the reply IS the ack — `rpc_writer.go:62-71`). Both expect rows
  * shaped by [[Envelope.messages]] (a `frame` binary column).
  */
class TcpFrameWriter(host: String, port: Int) extends ForeachWriter[Row] {
  @transient private var socket: Socket = _
  @transient private var out: DataOutputStream = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    socket = new Socket(host, port)
    out = new DataOutputStream(socket.getOutputStream)
    true
  }

  override def process(row: Row): Unit = {
    val frame = row.getAs[Array[Byte]]("frame")
    out.writeInt(frame.length)
    out.write(frame)
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (out != null) out.flush()
    if (socket != null) socket.close()
  }
}

/** K4: synchronous ack per frame; a missing/short ack fails the task (and
  * Spark retries the partition — at-least-once, idempotent downstream).
  */
class RpcFrameWriter(host: String, port: Int) extends ForeachWriter[Row] {
  @transient private var socket: Socket = _
  @transient private var out: DataOutputStream = _
  @transient private var in: DataInputStream = _
  @transient private var lastAck: Long = 0L

  override def open(partitionId: Long, epochId: Long): Boolean = {
    socket = new Socket(host, port)
    out = new DataOutputStream(socket.getOutputStream)
    in = new DataInputStream(socket.getInputStream)
    true
  }

  override def process(row: Row): Unit = {
    val frame = row.getAs[Array[Byte]]("frame")
    out.writeInt(frame.length)
    out.write(frame)
    out.flush()
    lastAck = in.readLong() // the reply is the ack
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (socket != null) socket.close()
  }
}
