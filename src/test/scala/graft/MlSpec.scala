package graft

import org.apache.spark.sql.functions._

import graft.ml.{Chunker, Keywords, ModelRegistry, SdgClassifier, StubEmbedder}

class MlSpec extends SparkSuite {

  // ---- Chunker (M1) invariants, SURVEY §7.5.3 ----

  test("chunker: no slice exceeds the word cap") {
    val text = ("Sentence one here. " * 20) + ("Another longer sentence " +
      "with several words in it. ") * 10
    val slices = Chunker.chunkText(text, maxWords = 12)
    assert(slices.nonEmpty)
    slices.foreach { s =>
      assert(s.split("\\s+").count(_.nonEmpty) <= 13) // cap + ellipsis token
    }
  }

  test("chunker: sentences are kept whole and in order") {
    val slices = Chunker.chunkText(
      "Alpha one. Beta two. Gamma three. Delta four.", maxWords = 5)
    assert(slices === Seq("Alpha one. Beta two.", "Gamma three. Delta four."))
  }

  test("chunker: over-long sentence truncated to maxWords-1 + '...' " +
    "(the reference's exact truncation rule)") {
    val long = (1 to 50).map(i => s"w$i").mkString(" ") + "."
    val slices = Chunker.chunkText(long, maxWords = 10)
    assert(slices.length === 1)
    assert(slices.head.endsWith("..."))
    assert(slices.head.split("\\s+").length === 9)
  }

  test("chunker: empty/null-ish input -> no slices") {
    assert(Chunker.chunkText("", 10).isEmpty)
    assert(Chunker.chunkText("   ", 10).isEmpty)
    assert(Chunker.chunkText(null, 10).isEmpty)
  }

  test("chunker: coverage — every input word appears in some slice") {
    val text = "One two three. Four five six. Seven eight."
    val joined = Chunker.chunkText(text, maxWords = 4).mkString(" ")
    "One two three Four five six Seven eight".split(" ").foreach { w =>
      assert(joined.contains(w), s"missing word $w")
    }
  }

  // ---- Stub embedder (M2 stand-in) ----

  test("stub embedder: deterministic, unit-norm float32") {
    val a = StubEmbedder.embed("hello spark world", 64)
    val b = StubEmbedder.embed("hello spark world", 64)
    assert(a.toSeq === b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("stub embedder: similar token bags score closer than disjoint") {
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val base = StubEmbedder.embed("spark catalyst engine query plan", 64)
    val near = StubEmbedder.embed("spark catalyst engine query optimizer", 64)
    val far = StubEmbedder.embed("banana apple orange grape melon", 64)
    assert(cos(base, near) > cos(base, far))
  }

  test("model registry resolves stub backends per name") {
    val fn = ModelRegistry.embedderFor("stub-32")
    assert(fn("abc").length === 32)
    intercept[IllegalArgumentException] {
      ModelRegistry.embedderFor("granite-unavailable")
    }
  }

  // ---- Real-inference seam (M2): safetensors weights -> matmul ----

  test("safetensors round-trip preserves shapes and values") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val path = s"$dir/t.safetensors"
    val a = graft.ml.SafeTensors.Tensor(Array(2, 3),
      Array(1.5f, -2.25f, 0f, 4f, 5f, -6.125f))
    val b = graft.ml.SafeTensors.Tensor(Array(4), Array(9f, 8f, 7f, 6f))
    graft.ml.SafeTensors.write(path, Seq("w" -> a, "bias" -> b))
    val loaded = graft.ml.SafeTensors.load(path)
    assert(loaded.keySet === Set("w", "bias"))
    assert(loaded("w").shape.toSeq === Seq(2, 3))
    assert(loaded("w").data.toSeq === a.data.toSeq)
    assert(loaded("bias").data.toSeq === b.data.toSeq)
  }

  test("tensor-file embedder: deterministic, unit-norm, and genuinely " +
      "weight-driven (perturbing one weight moves the output)") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val path = s"$dir/model.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyModel(path, vocab = 97,
      dModel = 16, outDim = 8)
    val m = graft.ml.TensorFileEmbedder.load(path)
    val v1 = m.embed("spark catalyst engine")
    assert(v1.length === 8)
    assert(v1.toSeq === m.embed("spark catalyst engine").toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // perturb one weight byte-equivalent: rewrite with a different seed
    val path2 = s"$dir/model2.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyModel(path2, vocab = 97,
      dModel = 16, outDim = 8, seed = 0xbadcafe)
    val v2 = graft.ml.TensorFileEmbedder.load(path2)
      .embed("spark catalyst engine")
    assert(v1.toSeq !== v2.toSeq,
      "different weights must produce different embeddings")
    // shared-token bags land closer than disjoint ones (pooled means
    // are close in model space; the dense+tanh head is continuous)
    def cos(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val base = m.embed("spark catalyst engine query plan")
    val near = m.embed("spark catalyst engine query optimizer")
    val far = m.embed("banana apple orange grape melon")
    assert(cos(base, near) > cos(base, far))
  }

  test("encoder STACK is real: depth, multi-head split, and word order " +
      "all change the embedding; CLS contract has no pooler head") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val path = s"$dir/stack.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyStackModel(path, vocab = 97,
      dModel = 16, layers = 2, heads = 2, dff = 32)
    val m = graft.ml.TensorFileEmbedder.load(path)
    val v = m.embed("spark catalyst engine")
    // CLS contract: output dim == dModel (no pooler head), unit norm
    assert(v.length === 16)
    assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0)
      < 1e-5)
    assert(v.toSeq === m.embed("spark catalyst engine").toSeq)
    // DEPTH is real: perturb one weight in the SECOND layer only
    val tensors = graft.ml.SafeTensors.load(path)
    tensors("encoder.layer.1.intermediate.dense.weight").data(5) += 0.5f
    val path2 = s"$dir/stack_l2.safetensors"
    graft.ml.SafeTensors.write(path2, tensors.toSeq)
    val movedDeep = graft.ml.TensorFileEmbedder.load(path2)
      .embed("spark catalyst engine")
    assert(v.toSeq !== movedDeep.toSeq,
      "a layer-2 weight must reach the output — the stack is live " +
        "end to end, not just its first block")
    // MULTI-HEAD is real: same weights, different head split => a
    // different attention pattern => a different embedding
    val t3 = graft.ml.SafeTensors.load(path)
    t3("config.num_attention_heads").data(0) = 4.0f
    val path3 = s"$dir/stack_h4.safetensors"
    graft.ml.SafeTensors.write(path3, t3.toSeq)
    val h4 = graft.ml.TensorFileEmbedder.load(path3)
      .embed("spark catalyst engine")
    assert(v.toSeq !== h4.toSeq,
      "the head split must change the function, not just relabel it")
    // WORD ORDER matters now (position embeddings + full attention):
    // the bag-of-words paths can't tell these apart, the stack must
    assert(m.embed("catalyst spark engine").toSeq !== v.toSeq,
      "position embeddings must make the encoder order-sensitive")
    // a missing layer tensor is a malformed file, not a fallback
    val partial = graft.ml.SafeTensors.load(path).toSeq
      .filterNot(_._1 == "encoder.layer.1.output.LayerNorm.bias")
    val path4 = s"$dir/stack_partial.safetensors"
    graft.ml.SafeTensors.write(path4, partial)
    intercept[IllegalArgumentException] {
      graft.ml.TensorFileEmbedder.load(path4)
    }
    // and the semantic contrast survives the full transformer
    def cos(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val b = m.embed("spark catalyst engine query plan")
    val near = m.embed("spark catalyst engine query optimizer")
    val far = m.embed("banana apple orange grape melon")
    assert(cos(b, near) > cos(b, far))
  }

  test("attention block is real: perturbing ONE attention weight moves " +
      "the embedding; removing the block changes the architecture") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val path = s"$dir/attn.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyModel(path, vocab = 97,
      dModel = 16, outDim = 8)
    val base = graft.ml.TensorFileEmbedder.load(path)
      .embed("spark catalyst engine")
    // surgically perturb a single attention.key weight and nothing else
    val tensors = graft.ml.SafeTensors.load(path)
    val wk = tensors("attention.key.weight")
    wk.data(3) += 0.25f
    val path2 = s"$dir/attn_perturbed.safetensors"
    graft.ml.SafeTensors.write(path2, tensors.toSeq)
    val moved = graft.ml.TensorFileEmbedder.load(path2)
      .embed("spark catalyst engine")
    assert(base.toSeq !== moved.toSeq,
      "a single attention weight must change the output — the Q/K/V " +
        "path is live, not decorative")
    // same seed WITHOUT the attention tensors = legacy mean-pool file:
    // loads fine (back-compat) and computes a different function
    val path3 = s"$dir/meanpool.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyModel(path3, vocab = 97,
      dModel = 16, outDim = 8, withAttention = false)
    val pooled = graft.ml.TensorFileEmbedder.load(path3)
      .embed("spark catalyst engine")
    assert(base.toSeq !== pooled.toSeq,
      "CLS attention pooling must differ from mean pooling")
    // a PARTIAL attention tensor set is a malformed file, not a fallback
    val partial = tensors.toSeq.filterNot(_._1 == "attention.value.weight")
    val path4 = s"$dir/partial.safetensors"
    graft.ml.SafeTensors.write(path4, partial)
    intercept[IllegalArgumentException] {
      graft.ml.TensorFileEmbedder.load(path4)
    }
    // attention weights also re-rank neighbors: softmax weighting is
    // input-dependent (CLS query attends differently per bag), so order
    // sensitivity beyond the bag-of-words pooled mean is possible — at
    // minimum the block keeps the shared-vs-disjoint contrast
    val m = graft.ml.TensorFileEmbedder.load(path)
    def cos(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val b = m.embed("spark catalyst engine query plan")
    assert(cos(b, m.embed("spark catalyst engine query optimizer")) >
      cos(b, m.embed("banana apple orange grape melon")))
  }

  test("safetensors round-trips arbitrary tensor sets (property)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val tensorGen = for {
      rank <- Gen.choose(1, 3)
      dims <- Gen.listOfN(rank, Gen.choose(1, 5))
      data <- Gen.listOfN(dims.product,
        Gen.chooseNum(-1e6f, 1e6f))
    } yield graft.ml.SafeTensors.Tensor(dims.toArray, data.toArray)
    val setGen = for {
      n <- Gen.choose(1, 6)
      ts <- Gen.listOfN(n, tensorGen)
    } yield ts.zipWithIndex.map { case (t, i) => s"t$i.weight" -> t }
    val dir = java.nio.file.Files.createTempDirectory("stp").toString
    var case_ = 0
    val prop = forAll(setGen) { tensors =>
      case_ += 1
      val path = s"$dir/m$case_.safetensors"
      graft.ml.SafeTensors.write(path, tensors)
      val loaded = graft.ml.SafeTensors.load(path)
      loaded.keySet == tensors.map(_._1).toSet &&
        tensors.forall { case (name, t) =>
          loaded(name).shape.sameElements(t.shape) &&
            loaded(name).data.sameElements(t.data)
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("BPE tokenizer drives the encoder: sibling .bpe artifact " +
      "switches tokenization to subword ids, a merge-table change " +
      "moves the embedding, and the artifact round-trips exactly") {
    val s = initSpark()
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stbpe").toString
    // a corpus where merges matter: 'banana' compresses to few pieces
    // under its own merges, stays character-level under none
    val docs = Seq.tabulate(20)(i => (i.toLong, "banana bandana band"))
      .toDF("doc_id", "text")
    val model = graft.operators.Bpe.train(docs, "text", numMerges = 12)
    assert(model.alphabet.nonEmpty)
    // artifact round-trip is EXACT (merges contain the \n Eow marker —
    // the escaping is load-bearing)
    val tokPath = s"$dir/stack.safetensors.bpe"
    graft.operators.Bpe.save(model, tokPath)
    val back = graft.operators.Bpe.loadModel(tokPath)
    assert(back.merges === model.merges)
    assert(back.alphabet === model.alphabet)
    assert(back.tokenIds === model.tokenIds)

    val path = s"$dir/stack.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyStackModel(path, vocab = 97,
      dModel = 16, layers = 1, heads = 2, dff = 32)
    // load() auto-discovers the sibling artifact; load(path, None) is
    // the legacy hashed-word path over the same weights
    val sub = graft.ml.TensorFileEmbedder.load(path)
    val hashed = graft.ml.TensorFileEmbedder.load(path, None)
    val text = "banana bandana band"
    assert(sub.embed(text).toSeq === sub.embed(text).toSeq)
    assert(sub.embed(text).toSeq !== hashed.embed(text).toSeq,
      "subword ids must select different embedding rows than " +
        "hashed whole words")
    // merge-table change => different token ids => different embedding
    // (same weights file both times)
    val model2 = graft.operators.Bpe.train(docs, "text", numMerges = 2)
    val tokPath2 = s"$dir/alt.bpe"
    graft.operators.Bpe.save(model2, tokPath2)
    val sub2 = graft.ml.TensorFileEmbedder.load(path, Some(tokPath2))
    assert(sub.embed(text).toSeq !== sub2.embed(text).toSeq,
      "a different merge table must move the embedding")
    // OOV pieces (code points outside the training alphabet) still
    // embed — the hash fallback keeps the no-OOV-loss contract
    assert(sub.embed("zzz éé").length === 16)
    // an id table larger than the embedding matrix is a loud error
    val tiny = s"$dir/tiny.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyStackModel(tiny,
      vocab = 4, dModel = 16, layers = 1, heads = 2, dff = 32)
    val e = intercept[IllegalArgumentException] {
      graft.ml.TensorFileEmbedder.load(tiny, Some(tokPath))
    }
    assert(e.getMessage.contains("token rows"))
  }

  test("model registry memoizes the safetensors backend per JVM (R7 " +
      "model-cache parity: the file parses once, tasks share it)") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val path = s"$dir/model.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyModel(path, vocab = 53,
      dModel = 8, outDim = 4)
    val f1 = ModelRegistry.embedderFor(s"safetensors:$path")
    val f2 = ModelRegistry.embedderFor(s"safetensors:$path")
    assert(f1 eq f2, "registry must return the memoized instance")
    assert(f1("hello world").length === 4)
  }

  // ---- SDG classifiers (M3/M4/M5) ----

  private def sliceDf = {
    val s = initSpark()
    import s.implicits._
    Seq(
      ("s1", "d1", StubEmbedder.embed("sdg topic 3", 64)),
      ("s2", "d1", StubEmbedder.embed("sdg topic 7", 64)),
      ("s3", "d2", StubEmbedder.embed("unrelated text entirely", 64))
    ).toDF("id", "document_id", "embedding")
  }

  private def biModel = {
    val s = initSpark()
    import s.implicits._
    // weights aligned with "sdg topic 3" -> that slice scores high
    Seq(("bi-1", StubEmbedder.embed("sdg topic 3", 64), 0.0, 0.55))
      .toDF("model_id", "weights", "bias", "threshold")
  }

  test("portable SDG classify: exact-integer logit decisions, " +
      "deterministic, internally consistent") {
    val s = initSpark()
    import s.implicits._
    val df = (1 to 40).map { i =>
      (i.toLong, StubEmbedder.embed(s"topic $i solar water energy", 64))
    }.toDF("vec_id", "embedding")
    val rows = SdgClassifier.classifyPortableQ(df).collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val (isSdg, logit, sdg) =
        (r.getBoolean(1), r.getLong(2), r.getInt(3))
      // the gate IS the logit comparison — no separate float path to
      // drift from
      assert(isSdg === (logit >= 2000000L))
      assert(sdg === -1 || (sdg >= 1 && sdg <= 17))
    }
    // decisions must be non-degenerate on varied inputs
    assert(rows.map(_.getInt(3)).distinct.length > 1)
    val again = SdgClassifier.classifyPortableQ(df).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "portable classify must be bit-deterministic")
  }

  test("binary classifier thresholds per-slice scores (M3)") {
    val out = SdgClassifier.classifyBinary(sliceDf, biModel)
    val m = out.collect().map(r =>
      r.getString(0) -> r.getBoolean(out.columns.indexOf("is_sdg"))).toMap
    assert(m("s1") === true)   // exact weight match -> sigmoid(1) ~ 0.73
    assert(m("s3") === false)
  }

  test("n-way classifier: argmax + threshold, forced set override (M4/M5)") {
    val s = initSpark()
    val nModel = SdgClassifier.stubModelTable(s, "n-1", 64)
    val out = SdgClassifier.classifyNWay(sliceDf, nModel)
    val m = out.collect().map(r => r.getString(0) ->
      Option(r.get(out.columns.indexOf("sdg_number")))).toMap
    assert(m("s1") === Some(3)) // embeds exactly as "sdg topic 3"
    assert(m("s2") === Some(7))
    assert(m("s3") === None)    // below threshold everywhere
    // forced: restrict s1 to {5}, no threshold
    import s.implicits._
    val forced = sliceDf.withColumn("external_sdg",
      typedlit(Seq(5)))
    val out2 = SdgClassifier.classifyNWay(forced, nModel,
      forcedCol = Some("external_sdg"))
    val m2 = out2.collect().map(r => r.getString(0) ->
      Option(r.get(out2.columns.indexOf("sdg_number")))).toMap
    assert(m2.values.forall(_ === Some(5)))
  }

  test("doc-level any-slice aggregation + top-k sdgs (A8/A4)") {
    val s = initSpark()
    import s.implicits._
    val sliceSdgs = Seq(
      ("d1", Some(3)), ("d1", Some(3)), ("d1", Some(7)), ("d1", Some(1)),
      ("d2", None: Option[Int])
    ).toDF("document_id", "sdg_number")
    val top2 = SdgClassifier.topKSdgsPerDocument(sliceSdgs, 2)
    val m = top2.collect().map(r =>
      r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(m("d1") === Seq(3, 1)) // 3 twice; tie 7/1 -> smaller sdg wins
    assert(!m.contains("d2"))
  }

  // ---- Keywords (M6) ----

  test("keyword candidates exclude stopwords") {
    val c = Keywords.candidates("the spark engine of the future", 2)
    assert(c.contains("spark"))
    assert(c.contains("spark engine"))
    assert(!c.exists(_.split(" ").contains("the")))
  }

  test("MMR extraction is deterministic and score-filtered") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(Tuple1(
      "spark engine spark engine distributed query processing framework"))
      .toDF("text")
    val out1 = df.select(Keywords.extract(col("text"), 64, topN = 5)
      .as("kws")).head().getSeq[org.apache.spark.sql.Row](0)
    val out2 = df.select(Keywords.extract(col("text"), 64, topN = 5)
      .as("kws")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(out1.map(_.getString(0)) === out2.map(_.getString(0)))
    assert(out1.nonEmpty && out1.length <= 5)
  }

  test("forcedSdgColumn: external_sdg wins, forced corpus forces all 17") {
    val s = initSpark()
    import s.implicits._
    import graft.ml.SdgClassifier
    val df = Seq(
      ("uved", """{"external_sdg":[3,7]}"""), // external beats corpus
      ("uved", "{}"),                         // forced corpus -> 1..17
      ("hal", "{}"),                          // neither -> null
      ("hal", null: String))                  // null details -> null
      .toDF("corpus", "details")
    val got = df.select(SdgClassifier.forcedSdgColumn(
        col("corpus"), col("details")).as("f"))
      .collect().map(r => Option(r.getSeq[Int](0)))
    assert(got(0) === Some(Seq(3, 7)))
    assert(got(1) === Some((1 to 17).toSeq))
    assert(got(2) === None && got(3) === None)
  }

  test("chunker: >1M-char input pre-splits, full word coverage kept") {
    // reference embedding_model_helpers.py:87-92 — spaCy caps input at
    // 1M chars, so longer docs are pre-split before sentence detection
    val sentence = "Twelve short words fill this one test sentence here now okay done. "
    val reps = graft.ml.Chunker.PreSplitChars / sentence.length + 1000
    val big = sentence * reps // ~1.07M chars
    assert(big.length > graft.ml.Chunker.PreSplitChars)
    val slices = graft.ml.Chunker.chunkText(big, maxWords = 64)
    assert(slices.nonEmpty)
    // coverage: no text dropped. A hard character cut CAN split one
    // word per boundary into two (the reference slices
    // full_content[i*split_size:(i+1)*split_size] the same way,
    // embedding_model_helpers.py:92-97), so allow +1 word per boundary
    val boundaries = big.length / graft.ml.Chunker.PreSplitChars
    val inWords = big.split("\\s+").count(_.nonEmpty)
    val outWords = slices.map(_.split("\\s+").count(_.nonEmpty)).sum
    assert(outWords >= inWords && outWords <= inWords + boundaries,
      s"pre-split coverage broken: in=$inWords out=$outWords " +
        s"boundaries=$boundaries")
    // cap invariant holds everywhere
    assert(slices.forall(_.split("\\s+").count(_.nonEmpty) <= 64))
  }
}
