package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{ProtoField, ProtoType}

/** Protobuf wire-format decode for stream payloads (the execution half of
  * the reference's `StreamFormat.PROTO` contract, data_format.py:109-133),
  * written from scratch against the PUBLIC protobuf encoding spec — no
  * protobuf runtime ships in this offline build, and none is needed for
  * flat messages: the wire format is tag-varint records
  * (`number << 3 | wireType`) with four live wire types (0 varint,
  * 1 fixed64, 2 length-delimited, 5 fixed32).
  *
  * Supported message surface (driven by a declared [[ProtoField]]
  * descriptor — the registry-level stand-in for a compiled message class):
  * int32/int64/sint32/sint64/bool varints, fixed64/double, fixed32/float,
  * string/bytes, and repeated int32/int64 (both packed wire-type-2 and
  * unpacked repeated wire-type-0 occurrences, per the spec parsers must
  * accept either). Unknown field numbers are skipped by wire type;
  * proto3 absent fields decode to their DEFAULTS (0 / false / "" / empty)
  * because proto3 serializers omit default values — decoding absence as
  * null would mis-read every zero-valued field. Malformed payloads yield a
  * null struct (same contract as `from_json` on corrupt input).
  */
object ProtoDecode {

  def sparkType(t: ProtoType): DataType = t match {
    case ProtoType.Int32 | ProtoType.SInt32 | ProtoType.Fixed32 => IntegerType
    case ProtoType.Int64 | ProtoType.SInt64 | ProtoType.Fixed64 => LongType
    case ProtoType.Bool => BooleanType
    case ProtoType.DoubleT => DoubleType
    case ProtoType.FloatT => FloatType
    case ProtoType.StringT => StringType
    case ProtoType.BytesT => BinaryType
    case ProtoType.RepInt32 => ArrayType(IntegerType, containsNull = false)
    case ProtoType.RepInt64 => ArrayType(LongType, containsNull = false)
  }

  def structType(fields: Seq[ProtoField]): StructType =
    StructType(fields.map(f => StructField(f.name, sparkType(f.ptype))))

  private object Malformed extends Exception { override def fillInStackTrace(): Throwable = this }

  private final class Cursor(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var acc = 0L
      while (shift < 70) {
        if (pos >= end) throw Malformed
        val x = b(pos); pos += 1
        acc |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return acc
        shift += 7
      }
      throw Malformed // varint longer than 10 bytes
    }
    def fixed64(): Long = {
      if (pos + 8 > end) throw Malformed
      var acc = 0L
      var i = 7
      while (i >= 0) { acc = (acc << 8) | (b(pos + i) & 0xffL); i -= 1 }
      pos += 8
      acc
    }
    def fixed32(): Int = {
      if (pos + 4 > end) throw Malformed
      val acc = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      acc
    }
    def delimited(): (Int, Int) = { // (start, end) of the sub-slice
      val n = varint()
      if (n < 0 || pos + n > end) throw Malformed
      val r = (pos, pos + n.toInt)
      pos += n.toInt
      r
    }
  }

  private def zigzag32(v: Long): Int = { val n = v.toInt; (n >>> 1) ^ -(n & 1) }
  private def zigzag64(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def default(t: ProtoType): Any = t match {
    case ProtoType.Int32 | ProtoType.SInt32 | ProtoType.Fixed32 => 0
    case ProtoType.Int64 | ProtoType.SInt64 | ProtoType.Fixed64 => 0L
    case ProtoType.Bool => false
    case ProtoType.DoubleT => 0.0
    case ProtoType.FloatT => 0.0f
    case ProtoType.StringT => ""
    case ProtoType.BytesT => Array.emptyByteArray
    case ProtoType.RepInt32 | ProtoType.RepInt64 => Seq.empty
  }

  /** Parse one message; null on malformed bytes. */
  def parse(bytes: Array[Byte], fields: Seq[ProtoField]): Row =
    parseIndexed(bytes, fields, fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap)

  private def parseIndexed(
      bytes: Array[Byte],
      fields: Seq[ProtoField],
      idx: Map[Int, (ProtoField, Int)]): Row = {
    val out = new Array[Any](fields.size)
    val reps = new Array[ArrayBuffer[Any]](fields.size)
    try {
      val c = new Cursor(bytes, 0, bytes.length)
      while (c.hasMore) {
        val tag = c.varint()
        val wt = (tag & 7).toInt
        val hit = idx.get((tag >>> 3).toInt)
        def append(i: Int, v: Any): Unit = {
          if (reps(i) == null) reps(i) = new ArrayBuffer[Any]
          reps(i) += v
        }
        wt match {
          case 0 =>
            val v = c.varint()
            hit.foreach { case (f, i) =>
              f.ptype match {
                case ProtoType.Int32 => out(i) = v.toInt
                case ProtoType.Int64 => out(i) = v
                case ProtoType.SInt32 => out(i) = zigzag32(v)
                case ProtoType.SInt64 => out(i) = zigzag64(v)
                case ProtoType.Bool => out(i) = v != 0L
                case ProtoType.RepInt32 => append(i, v.toInt)
                case ProtoType.RepInt64 => append(i, v)
                case _ => () // declared/wire mismatch: value consumed, skipped
              }
            }
          case 1 =>
            val v = c.fixed64()
            hit.foreach { case (f, i) =>
              f.ptype match {
                case ProtoType.Fixed64 => out(i) = v
                case ProtoType.DoubleT => out(i) = java.lang.Double.longBitsToDouble(v)
                case _ => ()
              }
            }
          case 5 =>
            val v = c.fixed32()
            hit.foreach { case (f, i) =>
              f.ptype match {
                case ProtoType.Fixed32 => out(i) = v
                case ProtoType.FloatT => out(i) = java.lang.Float.intBitsToFloat(v)
                case _ => ()
              }
            }
          case 2 =>
            val (s, e) = c.delimited()
            hit.foreach { case (f, i) =>
              f.ptype match {
                case ProtoType.StringT =>
                  out(i) = new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
                case ProtoType.BytesT => out(i) = java.util.Arrays.copyOfRange(bytes, s, e)
                case ProtoType.RepInt32 => // packed
                  val sub = new Cursor(bytes, s, e)
                  while (sub.hasMore) append(i, sub.varint().toInt)
                case ProtoType.RepInt64 =>
                  val sub = new Cursor(bytes, s, e)
                  while (sub.hasMore) append(i, sub.varint())
                case _ => ()
              }
            }
          case _ => throw Malformed // wire types 3/4 (groups) are dead per spec
        }
      }
      fields.zipWithIndex.foreach { case (f, i) =>
        if (reps(i) != null) out(i) = reps(i).toSeq
        else if (out(i) == null) out(i) = default(f.ptype)
      }
      Row.fromSeq(out.toIndexedSeq)
    } catch { case Malformed => null }
  }

  /** Decode the binary `value` column of `raw` into one `__graft_p` struct
    * column — same output contract as the JSON/CSV/Avro branches of
    * [[StreamFeatures.decode]]. Works on static and streaming frames alike;
    * the per-row parse is a partition-batched kernel (the same genuinely
    * imperative per-row-codec shape as Avro/multimodal decode).
    */
  def decode(raw: DataFrame, fields: Seq[ProtoField]): DataFrame = {
    require(fields.nonEmpty, "proto decode needs a declared field descriptor")
    // a duplicated tag number would silently win the .toMap index for one
    // field and freeze the other at its default — fail fast instead
    require(fields.map(_.number).distinct.size == fields.size,
      s"duplicate proto field numbers in descriptor: " +
        fields.groupBy(_.number).filter(_._2.size > 1).keys.toSeq.sorted.mkString(", "))
    require(fields.map(_.name).distinct.size == fields.size,
      "duplicate output column names in proto field descriptor")
    val outSchema = new StructType().add("__graft_p", structType(fields))
    val enc = Encoders.row(outSchema)
    raw.select(col("value").cast("binary"))
      .as[Array[Byte]](Encoders.BINARY)
      .mapPartitions { it =>
        // field index built once per task, not per row
        val idx = fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
        it.map(bytes => Row(parseIndexed(bytes, fields, idx)))
      }(enc)
  }
}
