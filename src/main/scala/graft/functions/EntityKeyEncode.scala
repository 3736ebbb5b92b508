package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's stable EntityKey binary encoding
  * (infra/key_encoding_utils.py:22-48): the online stores key their rows by
  * this byte string, so an engine that wants to READ or WRITE a reference
  * online store must reproduce it bit-for-bit. Layout (all little-endian):
  *
  *   for each join key, sorted by key name (code-point order, Python's
  *   `sorted` on str):   u32 type-marker STRING(2) ++ utf8(key name)
  *   then for each value, in the same sorted-key order:
  *     u32 value-type ++ u32 byte-length ++ value bytes
  *
  * Value encodings (the four types the reference supports):
  *   STRING(2) utf8 · BYTES(1) raw · INT32(3) 4-byte LE ·
  *   INT64(4) **also 4-byte LE** — the reference packs int64 with
  *   `struct.pack("<l", v)` (a 4-byte format), so values outside int32
  *   range raise in the reference; we throw the same way rather than
  *   silently diverge from the wire format.
  *
  * There is deliberately NO decoder: key names are written without a length
  * prefix, so the format is not self-delimiting — the reference never
  * deserializes it either (it is a hash-table lookup key only).
  *
  * Offline retrieval joins on native columns (correct and faster); this
  * expression is the documented online-parity seam. It evaluates via
  * [[CodegenFallback]] — it runs in online-sink projections, never in a
  * batch hot path.
  */
case class EntityKeyEncode(keyNames: Seq[String], children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (keyNames.size != children.size)
      return TypeCheckResult.TypeCheckFailure(
        s"${keyNames.size} key names but ${children.size} value expressions")
    if (keyNames.distinct.size != keyNames.size)
      return TypeCheckResult.TypeCheckFailure(s"duplicate join keys in $keyNames")
    children.map(_.dataType).find {
      case StringType | BinaryType | IntegerType | LongType => false
      case _ => true
    } match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"entity key values must be string/binary/int/bigint, got $bad " +
          "(the reference supports exactly these four, key_encoding_utils.py:10-19)")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    val values = children.map { c =>
      val v = c.eval(input)
      if (v == null) throw new IllegalArgumentException(
        "entity key values must be non-null (a null key cannot address an online row)")
      c.dataType match {
        case StringType => v.asInstanceOf[UTF8String].toString
        case _ => v
      }
    }
    EntityKeyEncode.serialize(keyNames.zip(values))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EntityKeyEncode =
    copy(children = newChildren)
  override def prettyName: String = "entity_key_encode"
}

object EntityKeyEncode {
  private def u32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** Python's `sorted` on str compares by code point. */
  private def byCodePoint(a: String, b: String): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
    }
    a.length < b.length
  }

  /** Serialize (joinKey -> value) pairs exactly like the reference's
    * serialize_entity_key. Accepted value types: String, Array[Byte], Int,
    * Long (int32 range only — the reference's `<l` pack is 4 bytes).
    */
  def serialize(pairs: Seq[(String, Any)]): Array[Byte] = {
    val sorted = pairs.sortWith((x, y) => byCodePoint(x._1, y._1))
    val out = new java.io.ByteArrayOutputStream()
    sorted.foreach { case (k, _) =>
      out.write(u32(2)) // ValueType.STRING marker for the key name
      out.write(k.getBytes("UTF-8"))
    }
    sorted.foreach { case (k, v) =>
      val (bytes, vt) = v match {
        case s: String => (s.getBytes("UTF-8"), 2)
        case b: Array[Byte] => (b, 1)
        case i: Int => (u32(i), 3)
        case l: Long =>
          if (l < Int.MinValue || l > Int.MaxValue)
            throw new IllegalArgumentException(
              s"int64 entity key $k=$l exceeds int32 range: the reference " +
                "packs INT64 with struct '<l' (4 bytes) and raises on " +
                "overflow (key_encoding_utils.py:16-17)")
          (u32(l.toInt), 4)
        case other => throw new IllegalArgumentException(
          s"unsupported entity key value type ${other.getClass} for $k")
      }
      out.write(u32(vt))
      out.write(u32(bytes.length))
      out.write(bytes)
    }
    out.toByteArray
  }

  /** Column API: `entityKey(Seq("user_id" -> col("user_id")))`. */
  def entityKey(pairs: Seq[(String, Column)]): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.toColumn(EntityKeyEncode(
      pairs.map(_._1), pairs.map(p => graftshim.toExpression(p._2))))
  }
}
