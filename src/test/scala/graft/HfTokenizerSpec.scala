package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{HfTokenizer, TensorFileEmbedder}

/** The huggingface tokenizer.json loader — the artifact format the
  * reference's AutoTokenizer reads (embedding_model_helpers.py:34-65).
  * Encodings are pinned by hand-derived fixtures; the embedder
  * integration proves checkpoint ids drive embedding rows IDENTITY-
  * mapped and pooling happens at the checkpoint's CLS row. */
class HfTokenizerSpec extends AnyFunSuite with SparkSuite {

  test("GPT-2 byte-to-unicode table: printables map to themselves, " +
      "space maps to \\u0120 (the public table)") {
    val t = HfTokenizer.ByteToChar
    assert(t('a'.toInt) === 'a')
    assert(t('!'.toInt) === '!')
    assert(t(0x20) === 'Ġ') // Ġ — the GPT-2 space marker
    assert(t(0x0A) === 'Ċ') // control chars shift into U+0100+
    assert(t.distinct.length === 256, "mapping must be injective")
  }

  private val bpeJson =
    """{
      |  "normalizer": null,
      |  "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false},
      |  "model": {
      |    "type": "BPE",
      |    "unk_token": null,
      |    "vocab": {"l":0,"o":1,"w":2,"e":3,"r":4,"lo":5,"low":6,
      |              "er":7,"Ġl":8,"Ġlo":9,"Ġlow":10},
      |    "merges": ["Ġ l","l o","lo w","Ġl o",
      |               "Ġlo w","e r"]
      |  },
      |  "added_tokens": [{"id": 11, "content": "[CLS]", "special": true}]
      |}""".stripMargin

  test("byte-level BPE: pinned merge walk, ids, CLS discovery") {
    val tok = HfTokenizer.parse(bpeJson)
    assert(tok.byteLevel)
    assert(tok.clsId === Some(11))
    assert(tok.tableSize === 12)
    val pieces = tok.encodePieces("low lower")
    // " lower" byte-encodes to Ġ l o w e r; rank order merges Ġ+l
    // BEFORE l+o (rank 0 < 1), so the Ġ-prefixed products win —
    // the subtlety real GPT-2 merge tables rely on
    assert(pieces.toSeq === Seq("low", "Ġlow", "er"))
    assert(pieces.flatMap(tok.idOf).toSeq === Seq(6, 10, 7))
    // no unk token: an unseen piece has no id (embedder hashes it)
    assert(tok.idOf("zzz") === None)
  }

  test("BPE merges also parse in the [a, b] array form") {
    val arr =
      """{
        |  "pre_tokenizer": {"type": "ByteLevel"},
        |  "model": {
        |    "type": "BPE",
        |    "vocab": {"l":0,"o":1,"w":2,"e":3,"r":4,"lo":5,"low":6,
        |              "er":7,"Ġl":8,"Ġlo":9,"Ġlow":10},
        |    "merges": [["Ġ","l"],["l","o"],["lo","w"],
        |               ["Ġl","o"],["Ġlo","w"],["e","r"]]
        |  }
        |}""".stripMargin
    val tok = HfTokenizer.parse(arr)
    assert(tok.encodePieces("low lower").toSeq ===
      Seq("low", "Ġlow", "er"))
    assert(tok.clsId === None)
  }

  private val wpJson =
    """{
      |  "normalizer": {"type": "BertNormalizer", "lowercase": true},
      |  "pre_tokenizer": {"type": "BertPreTokenizer"},
      |  "model": {
      |    "type": "WordPiece",
      |    "unk_token": "[UNK]",
      |    "continuing_subword_prefix": "##",
      |    "vocab": {"un":0,"##aff":1,"##able":2,"[UNK]":3,"[CLS]":4,
      |              "runn":5,"##ing":6,".":7}
      |  }
      |}""".stripMargin

  test("WordPiece: lowercase, greedy longest prefix, ## continuation, " +
      "unk for undecomposable words") {
    val tok = HfTokenizer.parse(wpJson)
    assert(!tok.byteLevel)
    assert(tok.lowercase)
    assert(tok.clsId === Some(4))
    assert(tok.encodePieces("Unaffable running.").toSeq ===
      Seq("un", "##aff", "##able", "runn", "##ing", "."))
    assert(tok.encodePieces("xyz").toSeq === Seq("[UNK]"))
    assert(tok.idOf("zzz") === Some(3), "unk fallback id")
  }

  test("BertNormalizer strips accents when lowercase (HF contract: " +
      "strip_accents=null follows lowercase)") {
    val json = wpJson.replace("\"un\":0", "\"cafe\":0")
    val tok = HfTokenizer.parse(json)
    assert(tok.stripAccents)
    assert(tok.encodePieces("Café").toSeq === Seq("cafe"))
    // explicit strip_accents: false overrides
    val noStrip = json.replace("\"lowercase\": true",
      "\"lowercase\": true, \"strip_accents\": false")
    val tok2 = HfTokenizer.parse(noStrip)
    assert(!tok2.stripAccents)
    assert(tok2.encodePieces("Café").toSeq === Seq("[UNK]"))
  }

  test("WordPiece splits CJK ideographs per character (BasicTokenizer " +
      "tokenize_chinese_chars contract)") {
    val json = wpJson.replace("\"runn\":5", "\"日\":5")
      .replace("\"##ing\":6", "\"本\":6")
    val tok = HfTokenizer.parse(json)
    // adjacent ideographs become separate words, never one ## chain
    assert(tok.encodePieces("日本").toSeq === Seq("日", "本"))
    assert(tok.encodePieces("un日").toSeq === Seq("un", "日"))
  }

  test("WordPiece maps words longer than 100 chars straight to [UNK] " +
      "(HF max_input_chars_per_word)") {
    val json = wpJson.replace("\"runn\":5", "\"u\":5")
      .replace("\"##ing\":6", "\"##u\":6")
    val tok = HfTokenizer.parse(json)
    // exactly 100 chars: decomposes (u + 99 × ##u)
    assert(tok.encodePieces("u" * 100).length === 100)
    // 101 chars: decomposable in principle, but the HF rule
    // short-circuits to unk before attempting decomposition
    assert(tok.encodePieces("u" * 101).toSeq === Seq("[UNK]"))
    // the limit is read from the checkpoint, not hardcoded
    val json8 = json.replace("\"unk_token\": \"[UNK]\"",
      "\"unk_token\": \"[UNK]\", \"max_input_chars_per_word\": 8")
    val tok8 = HfTokenizer.parse(json8)
    assert(tok8.encodePieces("u" * 8).length === 8)
    assert(tok8.encodePieces("u" * 9).toSeq === Seq("[UNK]"))
  }

  private val uniJson =
    """{
      |  "normalizer": null,
      |  "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
      |                    "prepend_scheme": "always"},
      |  "model": {
      |    "type": "Unigram",
      |    "unk_id": 0,
      |    "vocab": [["<unk>", 0.0], ["▁hello", -5.0], ["▁he", -1.0],
      |              ["▁h", -2.5], ["e", -1.0], ["l", -1.0],
      |              ["o", -1.0], ["ll", -1.8], ["▁wor", -3.0],
      |              ["ld", -2.0]]
      |  },
      |  "added_tokens": [{"id": 10, "content": "<s>", "special": true}]
      |}""".stripMargin

  test("Unigram (XLM-R/granite family): Metaspace prefix, exact " +
      "Viterbi max-sum (beats greedy-longest), index ids, unk lattice") {
    val tok = HfTokenizer.parse(uniJson)
    assert(tok.kind === "Unigram")
    assert(tok.clsId === Some(10)) // <s> from added_tokens
    assert(tok.tableSize === 11)
    // max-SUM segmentation: ▁he+ll+o = -3.8 beats the whole-word
    // ▁hello at -5.0 (greedy-longest would have taken ▁hello)
    assert(tok.encodePieces("hello").toSeq === Seq("▁he", "ll", "o"))
    // whole-piece path when it IS optimal
    assert(tok.encodePieces("hello world").toSeq ===
      Seq("▁he", "ll", "o", "▁wor", "ld"))
    // ids are vocab-array INDICES
    assert(tok.encodePieces("hello").flatMap(tok.idOf).toSeq ===
      Seq(2, 7, 6))
    // characters no piece covers surface as the unk token (id 0);
    // CONSECUTIVE unknowns fuse into ONE unk token (sentencepiece
    // emits one unk per run, not one per character)
    assert(tok.encodePieces("hxq").toSeq === Seq("▁h", "<unk>"))
    // unknowns separated by a known piece stay separate
    assert(tok.encodePieces("hxeq").toSeq ===
      Seq("▁h", "<unk>", "e", "<unk>"))
    assert(tok.idOf("<unk>") === Some(0))
  }

  // ---- sentencepiece Precompiled charsmap (r10 residual cut) ----
  //
  // Hand-built darts-clone double-array over UTF-8 byte keys: the test
  // constructs the PUBLIC blob layout (LE uint32 trie byte-size, LE
  // uint32 units, NUL-terminated replacement pool) with a tiny greedy
  // placer, so the loader is exercised against the real serialization
  // rather than a mock.
  private def buildCharsmap(entries: Seq[(String, String)]): String = {
    val pool = new java.io.ByteArrayOutputStream()
    val keyVals = entries.map { case (k, v) =>
      val off = pool.size()
      pool.write(v.getBytes(StandardCharsets.UTF_8)); pool.write(0)
      (k.getBytes(StandardCharsets.UTF_8), off)
    }
    final class N {
      var value: Int = -1
      val ch = scala.collection.mutable.TreeMap.empty[Int, N]
    }
    val root = new N
    keyVals.foreach { case (bytes, off) =>
      var n = root
      bytes.foreach { b => n = n.ch.getOrElseUpdate(b & 0xFF, new N) }
      n.value = off
    }
    val size = 4096
    val units = new Array[Int](size)
    val used = scala.collection.mutable.Set[Int](0)
    // darts-clone traversal: nodePos ^= byte, label check, nodePos ^=
    // offset; leaf value read at the post-offset slot (label 0)
    def place(n: N): Int = {
      val needed = (if (n.value >= 0) Seq(0) else Nil) ++ n.ch.keys
      var base = 1
      while (needed.exists(b => used(base ^ b))) base += 1
      needed.foreach(b => used += (base ^ b))
      if (n.value >= 0) units(base) = 0x80000000 | n.value
      n.ch.foreach { case (c, child) =>
        val childBase = place(child)
        val off = (base ^ c) ^ childBase
        units(base ^ c) = (off << 10) |
          (if (child.value >= 0) 1 << 8 else 0) | c
      }
      base
    }
    val rootBase = place(root)
    units(0) = rootBase << 10
    val bb = java.nio.ByteBuffer
      .allocate(4 + size * 4 + pool.size())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size * 4)
    units.foreach(bb.putInt)
    bb.put(pool.toByteArray)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  test("SpmPrecompiled: darts-clone charsmap replay — longest-prefix " +
      "replacement, single-codepoint passthrough, multi-codepoint keys") {
    import graft.ml.SpmPrecompiled
    val b64 = buildCharsmap(Seq(
      "Ａ" -> "A", // fullwidth A (NFKC)
      "①" -> "1", // circled one
      "ﬁ" -> "fi", // fi ligature
      "é" -> "é", // e + combining acute -> precomposed
      "e" -> "e")) // prefix of the above: longest match must win
    val spm = SpmPrecompiled.fromBase64(b64).get
    assert(spm.normalize("Ａbc") === "Abc")
    assert(spm.normalize("x①y") === "x1y")
    assert(spm.normalize("ﬁn") === "fin")
    // longest-prefix: "e" alone maps to "e", but "e"+combining-acute
    // must take the 3-byte key, not stop at the 1-byte prefix
    assert(spm.normalize("étude") === "étude")
    // unmatched codepoints (multi-byte) pass through verbatim
    assert(spm.normalize("日本 ok") === "日本 ok")
    assert(spm.normalize("") === "")
    assert(spm.normalize(null) === null)
  }

  test("Precompiled normalizer inside tokenizer.json drives Unigram " +
      "to the checkpoint's exact pieces on NFKC-divergent text") {
    val withNorm = uniJson.replace("\"normalizer\": null",
      "\"normalizer\": {\"type\": \"Sequence\", \"normalizers\": [" +
        "{\"type\": \"Precompiled\", \"precompiled_charsmap\": \"" +
        buildCharsmap(Seq("ｈ" -> "h")) + "\"}]}")
    val tok = HfTokenizer.parse(withNorm)
    // fullwidth h normalizes to ascii h, then segments like "hello"
    assert(tok.encodePieces("ｈello").toSeq ===
      Seq("▁he", "ll", "o"))
    // without the charsmap the fullwidth form is unknown
    val tokNo = HfTokenizer.parse(uniJson)
    assert(tokNo.encodePieces("ｈello").toSeq.head === "<unk>")
  }

  test("DataFrame surface: encode emits checkpoint ids, tokenStats " +
      "computes fertility/bytes-per-token from the real tokenizer") {
    val s = initSpark()
    val tok = HfTokenizer.parse(uniJson)
    val df = s.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "hello world"),
      org.apache.spark.sql.Row(2L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val enc = HfTokenizer.encode(df, "id", "text", tok)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Int](1)).toMap
    assert(enc(1L) === Seq(2, 7, 6, 8, 9)) // ▁he ll o ▁wor ld
    assert(enc(2L) === Seq())
    val st = HfTokenizer.tokenStats(df, "id", "text", tok)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getInt(1) === 5) // n_tokens
    assert(st(1L).getInt(2) === 2) // n_words
    assert(st(1L).getDouble(st(1L).fieldIndex("fertility")) === 2.5)
    assert(st(2L).getInt(1) === 0 &&
      st(2L).isNullAt(st(2L).fieldIndex("fertility")))
  }

  test("a tokenizer model type outside BPE/WordPiece/Unigram is " +
      "rejected loudly, not silently wrong") {
    val bad = """{"model": {"type": "WordLevel", "vocab": {}}}"""
    val e = intercept[IllegalArgumentException](HfTokenizer.parse(bad))
    assert(e.getMessage.contains("WordLevel"))
  }

  test("embedder integration: tokenizer.json is auto-discovered, " +
      "checkpoint ids drive rows identity-mapped, CLS row is the " +
      "checkpoint's own") {
    val dir = Files.createTempDirectory("hftok")
    val weights = dir.resolve("model.safetensors").toString
    TensorFileEmbedder.writeTinyModel(weights, vocab = 16, dModel = 8,
      outDim = 8)
    Files.write(dir.resolve("tokenizer.json"),
      bpeJson.getBytes(StandardCharsets.UTF_8))
    val hf = TensorFileEmbedder.load(weights)
    val legacy = TensorFileEmbedder.load(weights, None)
    val text = "low lower"
    val a = hf.embed(text)
    assert(!java.util.Arrays.equals(a, legacy.embed(text)),
      "checkpoint tokenization must change the embedding vs hashed words")

    // permuting two vocab ids moves the embedding: rows = ids, proven
    val permuted = bpeJson
      .replace("\"low\":6", "\"low\":13").replace("\"er\":7", "\"er\":14")
    Files.write(dir.resolve("tokenizer.json"),
      permuted.getBytes(StandardCharsets.UTF_8))
    val b = TensorFileEmbedder.load(weights).embed(text)
    assert(!java.util.Arrays.equals(a, b),
      "id permutation must select different embedding rows")

    // moving the CLS id moves the pooled row
    val movedCls = bpeJson.replace("\"id\": 11", "\"id\": 12")
    Files.write(dir.resolve("tokenizer.json"),
      movedCls.getBytes(StandardCharsets.UTF_8))
    val c = TensorFileEmbedder.load(weights).embed(text)
    assert(!java.util.Arrays.equals(a, c),
      "the pooling position must be the checkpoint's declared CLS row")

    // id space larger than the matrix = loud mismatch, not wrap-around
    val tooBig = bpeJson.replace("\"id\": 11", "\"id\": 99")
    Files.write(dir.resolve("tokenizer.json"),
      tooBig.getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException](
      TensorFileEmbedder.load(weights))
  }
}
