package graft.ml

import scala.util.hashing.MurmurHash3

/** Weights-file-backed embedding inference — the REAL half of the M2 seam
  * (reference: embedding_model_helpers.py:34-65 loads
  * granite-embedding-107m and runs pool + L2-norm; :125-163 caches the
  * loaded model per process). No ONNX/DJL runtime exists in this
  * environment, so the backend is framework-free: it loads real weights
  * from a safetensors file and runs the inference arithmetic itself —
  * embedding-matrix row lookup, masked mean pooling, a dense projection
  * (y = Wx + b), tanh, L2 normalization. That is a genuine (if tiny)
  * embedding-bag + pooler-head model executing real matmuls from real
  * tensors, not a hash trick: change a weight byte and every output
  * moves.
  *
  * Honest boundaries: tokenization is hashed into the vocab (no BPE vocab
  * file), and the architecture is linear, not a transformer. What this
  * proves — and what StubEmbedder could not — is the full production
  * seam: weights artifact on disk -> parsed -> resident per-executor
  * (ModelRegistry memoization) -> row-local inference inside the same
  * `Pipeline.vectorize` call that runs the stub.
  *
  * Expected tensors: `embeddings.weight` [vocab, dModel],
  * `pooler.dense.weight` [outDim, dModel], `pooler.dense.bias` [outDim].
  */
final class TensorFileEmbedder(
    embeddings: SafeTensors.Tensor,
    poolerWeight: SafeTensors.Tensor,
    poolerBias: SafeTensors.Tensor) extends Serializable {

  private val Array(vocab, dModel) = embeddings.shape
  private val Array(outDim, dIn) = poolerWeight.shape
  require(dIn == dModel,
    s"pooler expects input dim $dIn but embeddings emit $dModel")
  require(poolerBias.shape.sameElements(Array(outDim)),
    s"bias shape ${poolerBias.shape.mkString("x")} != [$outDim]")

  private val NonWord = java.util.regex.Pattern.compile("\\W+")

  def embed(text: String): Array[Float] = {
    val pooled = new Array[Double](dModel)
    var count = 0
    if (text != null) {
      val tokens = NonWord.split(text.toLowerCase)
      tokens.foreach { tok =>
        if (tok.nonEmpty) {
          val row = math.floorMod(MurmurHash3.stringHash(tok, 7919), vocab)
          val base = row * dModel
          var j = 0
          while (j < dModel) {
            pooled(j) += embeddings.data(base + j)
            j += 1
          }
          count += 1
        }
      }
    }
    if (count > 0) {
      var j = 0
      while (j < dModel) { pooled(j) /= count; j += 1 }
    }
    // dense head: y = tanh(W * pooled + b), then L2 normalize to float32
    val y = new Array[Double](outDim)
    var o = 0
    while (o < outDim) {
      var acc = poolerBias.data(o).toDouble
      val base = o * dModel
      var j = 0
      while (j < dModel) {
        acc += poolerWeight.data(base + j) * pooled(j)
        j += 1
      }
      y(o) = math.tanh(acc)
      o += 1
    }
    val norm = math.sqrt(y.map(v => v * v).sum)
    if (norm == 0.0) {
      val v = new Array[Float](outDim); v(0) = 1.0f; v
    } else y.map(v => (v / norm).toFloat)
  }
}

object TensorFileEmbedder {

  /** Load an embedder from a safetensors file. The path must be
    * executor-visible (shared FS / SparkFiles-distributed artifact in a
    * real cluster; a local path under local[*]). */
  def load(path: String): TensorFileEmbedder = {
    val t = SafeTensors.load(path)
    def get(name: String) = t.getOrElse(name,
      throw new IllegalArgumentException(
        s"safetensors file $path is missing tensor '$name' " +
          s"(has: ${t.keys.toSeq.sorted.mkString(", ")})"))
    new TensorFileEmbedder(get("embeddings.weight"),
      get("pooler.dense.weight"), get("pooler.dense.bias"))
  }

  /** Deterministic tiny-model generator (test fixture / smoke artifact):
    * seeded-LCG weights in [-0.5, 0.5), the exact tensor layout `load`
    * expects. Stands in for an exported real checkpoint. */
  def writeTinyModel(path: String, vocab: Int, dModel: Int, outDim: Int,
      seed: Long = 0x5eed): Unit = {
    var state = seed
    def next(): Float = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 24 bits -> [0,1) -> [-0.5, 0.5)
      ((state >>> 40).toFloat / (1 << 24).toFloat) - 0.5f
    }
    def tensor(shape: Int*) = SafeTensors.Tensor(shape.toArray,
      Array.fill(shape.product)(next()))
    SafeTensors.write(path, Seq(
      "embeddings.weight" -> tensor(vocab, dModel),
      "pooler.dense.weight" -> tensor(outDim, dModel),
      "pooler.dense.bias" -> tensor(outDim)))
  }
}
