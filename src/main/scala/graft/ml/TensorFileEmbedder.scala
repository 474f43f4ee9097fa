package graft.ml

import scala.util.hashing.MurmurHash3

/** Weights-file-backed embedding inference — the REAL half of the M2 seam
  * (reference: embedding_model_helpers.py:34-65 loads
  * granite-embedding-107m and runs CLS pooling + L2-norm; :125-163 caches
  * the loaded model per process). No ONNX/DJL runtime exists in this
  * environment, so the backend is framework-free: it loads real weights
  * from a safetensors file and runs the inference arithmetic itself —
  * embedding-matrix row lookup, ONE real self-attention block (Q/K/V
  * matmuls, scaled-dot-product softmax, residual), CLS pooling, a dense
  * projection (y = Wx + b), tanh, L2 normalization. Change a weight byte
  * in ANY tensor — including the attention projections — and the output
  * moves (MlSpec pins this).
  *
  * Attention, concretely (single head, CLS-pooled, so only the CLS row
  * of the attention output is ever needed):
  *   x_0 = CLS   (embedding row 0, reserved — BERT's [CLS] convention)
  *   x_j = token embeddings, j = 1..n  (n capped at MaxSeq)
  *   q = Wq x_0 ;  k_j = Wk x_j ;  v_j = Wv x_j
  *   a_j = softmax_j( q . k_j / sqrt(dModel) )
  *   ctx = x_0 + sum_j a_j v_j        (residual)
  * Cost is O(seq x dModel^2) per row, bounded by MaxSeq — row-local,
  * no shuffle, executes inside the same `Pipeline.vectorize` call that
  * runs the stub.
  *
  * Honest boundaries: tokenization is hashed into the vocab (no BPE
  * vocab file), one attention head and one block (granite-107m has 12),
  * no layer norm. What this proves is the production seam AND the
  * transformer arithmetic: weights artifact on disk -> parsed ->
  * resident per-executor (ModelRegistry) -> Q/K/V attention from those
  * tensors per row.
  *
  * Expected tensors: `embeddings.weight` [vocab, dModel],
  * `attention.query.weight` / `attention.key.weight` /
  * `attention.value.weight` [dModel, dModel] (all three or none —
  * absent = legacy masked-mean-pool file, kept loadable),
  * `pooler.dense.weight` [outDim, dModel], `pooler.dense.bias` [outDim].
  */
final class TensorFileEmbedder(
    embeddings: SafeTensors.Tensor,
    attention: Option[TensorFileEmbedder.Attention],
    poolerWeight: SafeTensors.Tensor,
    poolerBias: SafeTensors.Tensor) extends Serializable {

  import TensorFileEmbedder.MaxSeq

  private val Array(vocab, dModel) = embeddings.shape
  if (attention.isDefined) require(vocab >= 2,
    "embeddings.weight needs >= 2 rows (row 0 is the reserved CLS row)")
  private val Array(outDim, dIn) = poolerWeight.shape
  require(dIn == dModel,
    s"pooler expects input dim $dIn but embeddings emit $dModel")
  require(poolerBias.shape.sameElements(Array(outDim)),
    s"bias shape ${poolerBias.shape.mkString("x")} != [$outDim]")
  attention.foreach { a =>
    Seq("query" -> a.wq, "key" -> a.wk, "value" -> a.wv).foreach {
      case (n, t) => require(t.shape.sameElements(Array(dModel, dModel)),
        s"attention.$n.weight shape ${t.shape.mkString("x")} != " +
          s"[$dModel, $dModel]")
    }
  }

  private val NonWord = java.util.regex.Pattern.compile("\\W+")

  /** Token embedding rows for `text`. The two architectures use
    * DIFFERENT mappings on purpose:
    *  - attention files: row 0 is reserved for CLS, token rows land in
    *    [1, vocab), and the sequence is capped at MaxSeq (the attention
    *    block's cost is O(seq x dModel^2)).
    *  - legacy mean-pool files: the EXACT pre-attention mapping
    *    (floorMod into [0, vocab), uncapped) — a corpus vectorized with
    *    an attention-less weights file before this release re-embeds
    *    byte-identically after it; re-mapping rows under the same file
    *    would silently move every stored vector's space. */
  private def tokenRows(text: String): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val toks = NonWord.split(text.toLowerCase).iterator.filter(_.nonEmpty)
    if (attention.isDefined)
      toks.take(MaxSeq)
        .map(tok =>
          1 + math.floorMod(MurmurHash3.stringHash(tok, 7919), vocab - 1))
        .toArray
    else
      toks.map(tok =>
        math.floorMod(MurmurHash3.stringHash(tok, 7919), vocab)).toArray
  }

  private def embeddingRow(row: Int): Array[Double] = {
    val out = new Array[Double](dModel)
    val base = row * dModel
    var j = 0
    while (j < dModel) { out(j) = embeddings.data(base + j); j += 1 }
    out
  }

  /** y = M x for a row-major [dModel x dModel] tensor. */
  private def matVec(m: SafeTensors.Tensor, x: Array[Double])
      : Array[Double] = {
    val out = new Array[Double](dModel)
    var o = 0
    while (o < dModel) {
      var acc = 0.0
      val base = o * dModel
      var j = 0
      while (j < dModel) { acc += m.data(base + j) * x(j); j += 1 }
      out(o) = acc
      o += 1
    }
    out
  }

  /** CLS-pooled single-head attention over [CLS] ++ tokens. */
  private def attentionPool(attn: TensorFileEmbedder.Attention,
      rows: Array[Int]): Array[Double] = {
    val cls = embeddingRow(0)
    val q = matVec(attn.wq, cls)
    val n = rows.length
    // scaled dot-product scores over CLS itself + every token
    val keys = new Array[Array[Double]](n + 1)
    val vals = new Array[Array[Double]](n + 1)
    keys(0) = matVec(attn.wk, cls)
    vals(0) = matVec(attn.wv, cls)
    var i = 0
    while (i < n) {
      val x = embeddingRow(rows(i))
      keys(i + 1) = matVec(attn.wk, x)
      vals(i + 1) = matVec(attn.wv, x)
      i += 1
    }
    val invSqrtD = 1.0 / math.sqrt(dModel.toDouble)
    val scores = new Array[Double](n + 1)
    var maxS = Double.NegativeInfinity
    i = 0
    while (i <= n) {
      var dot = 0.0
      val k = keys(i)
      var j = 0
      while (j < dModel) { dot += q(j) * k(j); j += 1 }
      scores(i) = dot * invSqrtD
      if (scores(i) > maxS) maxS = scores(i)
      i += 1
    }
    // max-subtracted softmax (numerically stable for any weight scale)
    var z = 0.0
    i = 0
    while (i <= n) { scores(i) = math.exp(scores(i) - maxS); z += scores(i); i += 1 }
    val ctx = cls.clone() // residual: x_0 + sum_j a_j v_j
    i = 0
    while (i <= n) {
      val a = scores(i) / z
      val v = vals(i)
      var j = 0
      while (j < dModel) { ctx(j) += a * v(j); j += 1 }
      i += 1
    }
    ctx
  }

  /** Legacy pooling for files without attention tensors: masked mean of
    * the token embedding rows. */
  private def meanPool(rows: Array[Int]): Array[Double] = {
    val pooled = new Array[Double](dModel)
    rows.foreach { row =>
      val base = row * dModel
      var j = 0
      while (j < dModel) { pooled(j) += embeddings.data(base + j); j += 1 }
    }
    if (rows.nonEmpty) {
      var j = 0
      while (j < dModel) { pooled(j) /= rows.length; j += 1 }
    }
    pooled
  }

  def embed(text: String): Array[Float] = {
    val rows = tokenRows(text)
    val pooled = attention match {
      case Some(attn) => attentionPool(attn, rows)
      case None => meanPool(rows)
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

  /** Attention projection tensors, each [dModel x dModel]. */
  final case class Attention(wq: SafeTensors.Tensor,
      wk: SafeTensors.Tensor, wv: SafeTensors.Tensor) extends Serializable

  /** Sequence cap for the attention block: bounds per-row cost at
    * O(MaxSeq x dModel^2) regardless of document length (the chunker
    * already bounds slice sizes upstream; this is belt-and-braces for
    * raw text). */
  val MaxSeq = 128

  /** Load an embedder from a safetensors file. The path must be
    * executor-visible (shared FS / SparkFiles-distributed artifact in a
    * real cluster; a local path under local[*]). The attention tensors
    * are all-or-nothing: a partial set is a malformed file, not a
    * fallback. */
  def load(path: String): TensorFileEmbedder = {
    val t = SafeTensors.load(path)
    def get(name: String) = t.getOrElse(name,
      throw new IllegalArgumentException(
        s"safetensors file $path is missing tensor '$name' " +
          s"(has: ${t.keys.toSeq.sorted.mkString(", ")})"))
    val attn = (t.get("attention.query.weight"),
        t.get("attention.key.weight"),
        t.get("attention.value.weight")) match {
      case (Some(q), Some(k), Some(v)) => Some(Attention(q, k, v))
      case (None, None, None) => None
      case _ => throw new IllegalArgumentException(
        s"safetensors file $path has a PARTIAL attention tensor set — " +
          "need all of attention.{query,key,value}.weight or none")
    }
    new TensorFileEmbedder(get("embeddings.weight"), attn,
      get("pooler.dense.weight"), get("pooler.dense.bias"))
  }

  /** Deterministic tiny-model generator (test fixture / smoke artifact):
    * seeded-LCG weights in [-0.5, 0.5), the exact tensor layout `load`
    * expects — attention projections included by default (withAttention
    * = false reproduces a legacy mean-pool file). Stands in for an
    * exported real checkpoint. */
  def writeTinyModel(path: String, vocab: Int, dModel: Int, outDim: Int,
      seed: Long = 0x5eed, withAttention: Boolean = true): Unit = {
    var state = seed
    def next(): Float = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 24 bits -> [0,1) -> [-0.5, 0.5)
      ((state >>> 40).toFloat / (1 << 24).toFloat) - 0.5f
    }
    def tensor(shape: Int*) = SafeTensors.Tensor(shape.toArray,
      Array.fill(shape.product)(next()))
    val attn = if (withAttention) Seq(
      "attention.query.weight" -> tensor(dModel, dModel),
      "attention.key.weight" -> tensor(dModel, dModel),
      "attention.value.weight" -> tensor(dModel, dModel)) else Seq.empty
    SafeTensors.write(path, Seq(
      "embeddings.weight" -> tensor(vocab, dModel)) ++ attn ++ Seq(
      "pooler.dense.weight" -> tensor(outDim, dModel),
      "pooler.dense.bias" -> tensor(outDim)))
  }
}
