package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EntityKeyEncode vs byte vectors produced by executing the REFERENCE
  * algorithm (key_encoding_utils.py:22-48 — struct.pack('<I'/'<i'/'<l'),
  * sorted join keys, names-then-values) in Python against the same inputs.
  * The vectors below are those runs' hex outputs, hand-pasted: the two
  * implementations share no code, so equality is a real wire-format oracle.
  */
class EntityKeyEncodeSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("serialize matches reference vectors (int64, composite, bytes, negative)") {
    // ser([('user_id', int64 1001)])
    assert(hex(EntityKeyEncode.serialize(Seq("user_id" -> 1001L))) ==
      "02000000757365725f69640400000004000000e9030000")
    // ser([('order_id', 'o-9'), ('cust_id', int32 7)]) — sorted: cust_id first
    assert(hex(EntityKeyEncode.serialize(
      Seq("order_id" -> "o-9", "cust_id" -> 7))) ==
      "02000000637573745f6964020000006f726465725f696403000000040000000700000002000000030000006f2d39")
    // ser([('k', bytes 01 ff)])
    assert(hex(EntityKeyEncode.serialize(
      Seq("k" -> Array[Byte](0x01, 0xff.toByte)))) ==
      "020000006b010000000200000001ff")
    // ser([('b_key', 'x'), ('a_key', int64 -2)]) — negative int64, key sort
    assert(hex(EntityKeyEncode.serialize(
      Seq("b_key" -> "x", "a_key" -> -2L))) ==
      "02000000615f6b657902000000625f6b65790400000004000000feffffff020000000100000078")
  }

  test("int64 outside int32 range throws (the reference's struct '<l' raises)") {
    intercept[IllegalArgumentException] {
      EntityKeyEncode.serialize(Seq("user_id" -> (1L << 40)))
    }
  }

  test("Column API encodes per row and matches the scalar serializer") {
    import spark.implicits._
    val df = Seq((1001L, "o-9"), (7L, "zz")).toDF("user_id", "tag")
    val got = df.select(EntityKeyEncode.entityKey(
      Seq("user_id" -> col("user_id"), "tag" -> col("tag"))).as("ek"))
      .collect().map(r => hex(r.getAs[Array[Byte]](0))).toSeq
    val want = Seq(
      hex(EntityKeyEncode.serialize(Seq("user_id" -> 1001L, "tag" -> "o-9"))),
      hex(EntityKeyEncode.serialize(Seq("user_id" -> 7L, "tag" -> "zz"))))
    assert(got == want)
  }

  test("type check rejects unsupported value types; null values throw") {
    import spark.implicits._
    val df = Seq((1.5, 1L)).toDF("d", "k")
    intercept[Exception] {
      df.select(EntityKeyEncode.entityKey(Seq("d" -> col("d")))).collect()
    }
    val nulls = Seq((java.lang.Long.valueOf(1L), Option.empty[String]))
      .toDF("k", "s")
    intercept[Exception] {
      nulls.select(EntityKeyEncode.entityKey(
        Seq("k" -> col("k"), "s" -> col("s")))).collect()
    }
  }
}
