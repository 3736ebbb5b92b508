package graft.streaming

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro record decode for stream payloads (the execution half of the
  * reference's `StreamFormat.AVRO` contract, data_format.py:109-133), built
  * directly on the core `org.apache.avro` library that ships with Spark —
  * the `spark-avro` connector module is not in this offline build, so the
  * decode runs as a partition-batched kernel (one reusable
  * `GenericDatumReader` + `BinaryDecoder` per partition, the same
  * per-row-codec shape as the multimodal binary decode).
  *
  * Supported schema surface: a top-level RECORD of primitive fields
  * (boolean/int/long/float/double/string/bytes), nullable unions
  * `[null, T]`, and arrays of primitives — the payload shapes
  * data_format.py's Avro contract exercises. Undecodable payloads yield a
  * null struct (same contract as `from_json` on corrupt input).
  */
object AvroDecode {

  /** Avro schema → Spark type for the supported surface. */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
      sparkType(nonNull.head)
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), sparkType(f.schema()))))
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private def toSpark(v: Any, s: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s2: java.lang.CharSequence => s2.toString
    case b: ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case rec: GenericRecord =>
      val rs = rec.getSchema
      Row.fromSeq(rs.getFields.asScala.toSeq.map(f =>
        toSpark(rec.get(f.pos()), f.schema())))
    case arr: java.util.Collection[_] =>
      val elem = resolve(s).getElementType
      arr.asScala.toSeq.map(e => toSpark(e, elem))
    case other => other
  }

  private def resolve(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL).head
    case _ => s
  }

  /** Decode the binary `value` column of `raw` (Kafka wire shape) into one
    * `__graft_p` struct column — same output contract as the JSON/CSV
    * branches of [[StreamFeatures.decode]]. Works on static and streaming
    * frames alike.
    */
  def decode(raw: DataFrame, schemaJson: String): DataFrame = {
    val structType = sparkType(new Schema.Parser().parse(schemaJson)) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"avro stream schema must be a record, mapped to $other")
    }
    val outSchema = new StructType().add("__graft_p", structType)
    val enc = Encoders.row(outSchema)
    raw.select(col("value").cast("binary"))
      .as[Array[Byte]](Encoders.BINARY)
      .mapPartitions { it =>
        // schema/reader/decoder are per-partition state: the Schema object
        // is not serializable-friendly, so parse once per task
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        var decoder: BinaryDecoder = null
        it.map { bytes =>
          val struct =
            try {
              decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
              toSpark(reader.read(null, decoder), schema).asInstanceOf[Row]
            } catch { case _: Exception => null }
          Row(struct)
        }
      }(enc)
  }
}
