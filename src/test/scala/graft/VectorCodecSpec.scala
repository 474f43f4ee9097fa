package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.expr.VectorCodec

class VectorCodecSpec extends SparkSuite {

  test("floatVectorToBytes produces numpy-compatible float32-LE bytes") {
    val s = initSpark()
    import s.implicits._
    val vec = Array(1.0f, -0.5f, 3.25f)
    val expected = {
      val buf = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      vec.foreach(buf.putFloat)
      buf.array()
    }
    val got = Seq(Tuple1(vec)).toDF("v")
      .select(VectorCodec.floatVectorToBytes(col("v")).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(got.toSeq === expected.toSeq)
  }

  test("bytes -> vector -> bytes round-trips bit-exactly") {
    val s = initSpark()
    import s.implicits._
    val vec = Array(0.1f, Float.MinPositiveValue, -1e30f, 0.0f)
    val df = Seq(Tuple1(vec)).toDF("v")
      .select(VectorCodec.floatVectorToBytes(col("v")).as("b"))
      .select(VectorCodec.bytesToFloatVector(col("b")).as("v2"))
    val got = df.head().getSeq[Float](0)
    assert(got.toSeq.map(java.lang.Float.floatToIntBits)
      === vec.toSeq.map(java.lang.Float.floatToIntBits))
  }

  test("null propagates") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(VectorCodec.bytesToFloatVector(col("b")).as("v"))
    assert(df.head().isNullAt(0))
  }

  test("codec works under both codegen and interpreted eval") {
    val s = initSpark()
    import s.implicits._
    val df = (1 to 100).map(i => Tuple1(Array(i.toFloat, -i.toFloat)))
      .toDF("v")
    // wholestage path
    val n1 = df.select(VectorCodec.floatVectorToBytes(col("v")).as("b"))
      .where(octet_length(col("b")) === 8).count()
    assert(n1 === 100)
    // interpreted path
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val n2 = df.select(VectorCodec.floatVectorToBytes(col("v")).as("b"))
        .where(octet_length(col("b")) === 8).count()
      assert(n2 === 100)
    } finally s.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
