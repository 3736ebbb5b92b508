package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{ProtoField, ProtoType, StreamFormat, StreamSource}

/** From-scratch proto wire-format decode vs a hand-rolled encoder written
  * directly from the public encoding spec — the two sides share no code, so
  * agreement is a real round-trip oracle. Covers every supported type,
  * zigzag negatives, packed AND unpacked repeated, unknown-field skipping,
  * proto3 absent-field defaults, and malformed-payload null contract.
  */
class ProtoDecodeSpec extends SparkSpec {
  import spark.implicits._

  // -- minimal wire-format ENCODER (test-side oracle) --------------------
  private def vint(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var x = v
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt
      x = x >>> 7
      more = x != 0
      out += (if (more) (b | 0x80).toByte else b.toByte)
    }
    out.toArray
  }
  private def key(n: Int, wt: Int) = vint((n.toLong << 3) | wt)
  private def zz64(v: Long): Long = (v << 1) ^ (v >> 63)
  private def le64(v: Long): Array[Byte] = (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
  private def le32(v: Int): Array[Byte] = (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray
  private def delim(n: Int, payload: Array[Byte]): Array[Byte] =
    key(n, 2) ++ vint(payload.length.toLong) ++ payload

  private val fields = Seq(
    ProtoField(1, "uid", ProtoType.Int64),
    ProtoField(2, "v", ProtoType.DoubleT),
    ProtoField(3, "tag", ProtoType.StringT),
    ProtoField(4, "toks", ProtoType.RepInt32),
    ProtoField(5, "delta", ProtoType.SInt64),
    ProtoField(6, "flag", ProtoType.Bool),
    ProtoField(7, "fx", ProtoType.Fixed32),
    ProtoField(8, "raw", ProtoType.BytesT),
    ProtoField(9, "ff", ProtoType.FloatT),
    ProtoField(10, "neg", ProtoType.Int32))

  private def fullMessage: Array[Byte] =
    key(1, 0) ++ vint(7L) ++
      key(2, 1) ++ le64(java.lang.Double.doubleToLongBits(0.5)) ++
      delim(3, "héllo".getBytes("UTF-8")) ++
      delim(4, vint(1) ++ vint(2) ++ vint(300)) ++ // packed repeated
      key(5, 0) ++ vint(zz64(-7L)) ++
      key(6, 0) ++ vint(1L) ++
      key(7, 5) ++ le32(42) ++
      delim(8, Array[Byte](1, 2, 3)) ++
      key(9, 5) ++ le32(java.lang.Float.floatToIntBits(1.5f)) ++
      key(10, 0) ++ vint(-1L) ++ // negative int32 = 10-byte varint
      key(99, 0) ++ vint(12345L) ++ // unknown varint field -> skipped
      delim(98, Array[Byte](9, 9, 9)) // unknown delimited field -> skipped

  test("parse round-trips every supported type, skips unknown fields") {
    val r = ProtoDecode.parse(fullMessage, fields)
    assert(r.getLong(0) == 7L)
    assert(r.getDouble(1) == 0.5)
    assert(r.getString(2) == "héllo")
    assert(r.getSeq[Int](3) == Seq(1, 2, 300))
    assert(r.getLong(4) == -7L)
    assert(r.getBoolean(5))
    assert(r.getInt(6) == 42)
    assert(r.getAs[Array[Byte]](7).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getFloat(8) == 1.5f)
    assert(r.getInt(9) == -1)
  }

  test("absent fields decode to proto3 defaults; unpacked repeated accepted") {
    val msg = key(1, 0) ++ vint(2L) ++
      key(4, 0) ++ vint(4L) ++ key(4, 0) ++ vint(5L) // unpacked occurrences
    val r = ProtoDecode.parse(msg, fields)
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[Int](3) == Seq(4, 5))
    assert(r.getDouble(1) == 0.0 && r.getString(2) == "" && r.getLong(4) == 0L)
    assert(!r.getBoolean(5) && r.getInt(6) == 0)
    assert(r.getAs[Array[Byte]](7).isEmpty && r.getFloat(8) == 0.0f && r.getInt(9) == 0)
  }

  test("malformed payloads parse to null, not crash") {
    assert(ProtoDecode.parse(Array[Byte](0x80.toByte), fields) == null) // truncated varint
    assert(ProtoDecode.parse(key(3, 2) ++ vint(100L), fields) == null) // length overruns
    assert(ProtoDecode.parse(key(1, 3) , fields) == null) // dead group wire type
    assert(ProtoDecode.parse(key(2, 1) ++ Array[Byte](1, 2), fields) == null) // short fixed64
  }

  test("decode through StreamFeatures with field mapping, static and streaming") {
    val source = StreamSource(
      topic = "events", bootstrapServers = "broker:9092",
      format = StreamFormat.Proto("graft.TestMsg", fields),
      eventTimestampColumn = "uid",
      fieldMapping = Map("uid" -> "user_id"))
    val payloads = Seq(fullMessage, Array[Byte](0x80.toByte))
    val rows = StreamFeatures.decode(payloads.toDF("value"), source).collect()
    assert(rows.length == 2)
    val ok = rows.filter(!_.isNullAt(0)).head
    assert(ok.getLong(ok.fieldIndex("user_id")) == 7L)
    assert(ok.getSeq[Int](ok.fieldIndex("toks")) == Seq(1, 2, 300))
    assert(rows.count(_.isNullAt(0)) == 1) // corrupt row -> null fields
    // streaming path: same decode over a MemoryStream
    val mem = MemoryStream[Array[Byte]](spark)
    mem.addData(payloads: _*)
    val q = StreamFeatures.decode(mem.toDF().select(col("value")), source)
      .writeStream.format("memory").queryName("t_proto").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("t_proto").count() == 2)
    // no descriptor -> the documented seam still raises
    intercept[UnsupportedOperationException] {
      StreamFeatures.decode(payloads.toDF("value"),
        source.copy(format = StreamFormat.Proto("my.Msg")))
    }
  }
}
