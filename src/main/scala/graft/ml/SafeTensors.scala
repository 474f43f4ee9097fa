package graft.ml

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Minimal reader/writer for the public safetensors tensor-file format
  * (huggingface/safetensors spec): an unsigned-64 LE header length, a JSON
  * header mapping tensor name -> {dtype, shape, data_offsets}, then one
  * contiguous raw buffer the offsets index into. F32 only — the dtype the
  * reference's embedding contract uses end-to-end (M2:
  * embedding_model_helpers.py:34-65 emits fp32).
  *
  * This is the weights-on-disk half of the real-inference seam: a model
  * exported from any framework as safetensors loads here with no
  * framework dependency, which is what a zero-egress Spark executor
  * actually needs. */
object SafeTensors {

  final case class Tensor(shape: Array[Int], data: Array[Float]) {
    require(shape.product == data.length,
      s"shape ${shape.mkString("x")} != data length ${data.length}")
  }

  def write(path: String, tensors: Seq[(String, Tensor)]): Unit = {
    val mapper = new ObjectMapper()
    val header = mapper.createObjectNode()
    var offset = 0L
    tensors.foreach { case (name, t) =>
      val bytes = t.data.length.toLong * 4
      val entry = header.putObject(name)
      entry.put("dtype", "F32")
      val shapeArr = entry.putArray("shape")
      t.shape.foreach(shapeArr.add)
      val offs = entry.putArray("data_offsets")
      offs.add(offset); offs.add(offset + bytes)
      offset += bytes
    }
    val headerBytes = mapper.writeValueAsBytes(header)
    val buf = ByteBuffer.allocate(8 + headerBytes.length + offset.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(headerBytes.length.toLong)
    buf.put(headerBytes)
    tensors.foreach { case (_, t) => t.data.foreach(buf.putFloat) }
    Files.write(Paths.get(path), buf.array())
  }

  def load(path: String): Map[String, Tensor] = {
    val all = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(all).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen = buf.getLong()
    require(headerLen > 0 && headerLen <= Int.MaxValue - 8,
      s"implausible safetensors header length $headerLen in $path")
    val headerBytes = new Array[Byte](headerLen.toInt)
    buf.get(headerBytes)
    val dataStart = 8 + headerLen.toInt
    val mapper = new ObjectMapper()
    val header = mapper.readTree(headerBytes)
    val names = header.fieldNames()
    val out = Map.newBuilder[String, Tensor]
    while (names.hasNext) {
      val name = names.next()
      if (name != "__metadata__") {
        val entry = header.get(name)
        val dtype = entry.get("dtype").asText()
        require(dtype == "F32",
          s"tensor '$name' has dtype $dtype; only F32 is supported")
        val shape = {
          val it = entry.get("shape").elements()
          val b = Array.newBuilder[Int]
          while (it.hasNext) b += it.next().asInt()
          b.result()
        }
        val begin = entry.get("data_offsets").get(0).asLong()
        val end = entry.get("data_offsets").get(1).asLong()
        // mirror the headerLen guard: un-validated offsets would wrap
        // negative through .toInt below and surface as an opaque
        // IndexOutOfBounds (or worse, mis-index) instead of a format error
        require(begin >= 0 && begin <= end && dataStart + end <= all.length,
          s"tensor '$name' has malformed data_offsets [$begin, $end] " +
            s"for a ${all.length}-byte file in $path")
        val n = ((end - begin) / 4).toInt
        val data = new Array[Float](n)
        val fb = ByteBuffer.wrap(all, dataStart + begin.toInt,
          (end - begin).toInt).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { data(i) = fb.getFloat(); i += 1 }
        out += name -> Tensor(shape, data)
      }
    }
    out.result()
  }
}
