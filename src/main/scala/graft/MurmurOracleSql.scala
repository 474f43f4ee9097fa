package graft

/** DuckDB oracle SQL for the engine-local-hash near-dup queries —
  * round 11's promotion of q22 (MinHash over scala murmur3) and q23
  * (SimHash over scala murmur3) from the rows-only tier to
  * hash-checked.
  *
  * Both signers hash with `scala.util.hashing.MurmurHash3.stringHash`
  * (murmur3 x86_32 over UTF-16 code units, two per round — public
  * algorithm), which DuckDB lacks; these generators REPLAY it in SQL:
  * a recursive CTE walks each string two chars per step. For
  * BMP-only text DuckDB's character semantics line up exactly with
  * UTF-16 — `length()` counts codepoints = code units and
  * `ascii(substr(s, i, 1))` yields the codepoint = the `charAt`
  * value — so the replay is bit-identical for ALL BMP corpora (the
  * driver testdata is ASCII, a strict subset); only astral-plane
  * characters (2 UTF-16 units vs 1 codepoint) would diverge, the
  * documented boundary. 32-bit wraparound
  * arithmetic done in HUGEINT-mod-2^32 and rotations as
  * shift-and-add. The q22 LSH bucket additionally replays Spark's
  * `hash()` over the signature slice — Murmur3_x86_32 hashLong folded
  * across the band's four minhashes (seed 42) then hashInt of the
  * band index — so candidate generation matches Spark's down to
  * 32-bit bucket collisions. MurmurReplaySpec pins both libraries'
  * reference values against the replay's constants.
  *
  * Structural notes (DuckDB 1.0.0): every multiply that can exceed
  * 2^63 routes through HUGEINT; every intermediate that is referenced
  * more than once gets its own MATERIALIZED CTE layer — DuckDB
  * inlines lateral aliases and plain CTEs textually, and the
  * four-level bucket fold otherwise explodes exponentially during
  * planning (observed: 12 GB of planner memory before the layered
  * form; 1 s after).
  */
object MurmurOracleSql {

  private val M32 = 4294967296L
  private val P31 = 2147483647L

  private def mul(e: String, c: Long): String =
    s"((($e)::HUGEINT * $c) % $M32)::BIGINT"
  private def rotl(e: String, r: Int): String =
    s"(((($e) * ${1L << r}) % $M32) + (($e) // ${1L << (32 - r)}))"
  private def mixK(e: String): String =
    mul(rotl(mul(e, 3432918353L), 15), 461845907L)
  private def mixH(h: String, k: String): String = {
    val hx = s"xor($h, $k)"
    s"((${rotl(hx, 13)} * 5 + 3864292196) % $M32)"
  }
  private def mix(h: String, d: String): String = mixH(h, mixK(d))

  /** fmix avalanche as four MATERIALIZED layers (each duplicated
    * operand stays a plain column). */
  private def avalCtes(name: String, src: String, in: String,
      xorConst: String, keep: Seq[String], out: String): String = {
    val k = keep.mkString(", ")
    s"""${name}_1 AS MATERIALIZED (
  SELECT $k, xor($in, $xorConst) AS v1 FROM $src),
${name}_2 AS MATERIALIZED (
  SELECT $k, ${mul("xor(v1, v1 // 65536)", 2246822507L)} AS v2 FROM ${name}_1),
${name}_3 AS MATERIALIZED (
  SELECT $k, ${mul("xor(v2, v2 // 8192)", 3266489909L)} AS v3 FROM ${name}_2),
$name AS MATERIALIZED (
  SELECT $k, xor(v3, v3 // 65536) AS $out FROM ${name}_3)"""
  }

  /** The recursive scala-stringHash walk over `srcCte(keyCol)` with two
    * seeds, finalized to unsigned-32 columns h1f/h2f (plus `keep`). */
  private def stringHashCtes(srcCte: String, keyCol: String,
      seed1: Long, seed2: Long, keep: Seq[String]): String = {
    val keepS = (Seq("s") ++ keep).mkString(", ")
    val baseCols = (Seq(keyCol) ++ keep ++ Seq(s"length($keyCol)", "0",
      s"$seed1::BIGINT", s"$seed2::BIGINT")).mkString(", ")
    s"""mm(${(Seq("s") ++ keep).mkString(", ")}, len, pos, h1, h2) AS (
  SELECT $baseCols FROM $srcCte
  UNION ALL
  SELECT $keepS, len, pos + 2, ${mix("h1", "data")}, ${mix("h2", "data")}
  FROM (
    SELECT $keepS, len, pos, h1, h2,
      (ascii(substr(s, pos+1, 1))::BIGINT * 65536 + ascii(substr(s, pos+2, 1))) AS data
    FROM mm WHERE pos + 1 < len) t),
term AS MATERIALIZED (
  SELECT $keepS, len,
    CASE WHEN len % 2 = 1 THEN xor(h1, ${mixK("ascii(substr(s, len, 1))")}) ELSE h1 END AS t1,
    CASE WHEN len % 2 = 1 THEN xor(h2, ${mixK("ascii(substr(s, len, 1))")}) ELSE h2 END AS t2
  FROM mm WHERE pos + 1 >= len),
${avalCtes("fh1", "term", "t1", "len", Seq("s") ++ keep ++ Seq("len", "t2"), "h1f")},
${avalCtes("fh2", "fh1", "t2", "len", Seq("s") ++ keep ++ Seq("h1f"), "h2f")}"""
  }

  /** Spark Murmur3_x86_32.hashLong(v, seed) as layered CTEs; our
    * minhash values are < 2^31 so the high word is 0 and round two is
    * mixH(h, mixK(0)=0). */
  private def hashLongCtes(name: String, src: String, vCol: String,
      seedExpr: String, keep: Seq[String], out: String): String = {
    val k = keep.mkString(", ")
    s"""${name}_a AS MATERIALIZED (
  SELECT $k, ${mixH(seedExpr, mixK(vCol))} AS ra FROM $src),
${name}_b AS MATERIALIZED (
  SELECT $k, ${mixH("ra", "0")} AS rb FROM ${name}_a),
${avalCtes(name, s"${name}_b", "rb", "8", keep, out)}"""
  }

  private def hashIntCtes(name: String, src: String, vCol: String,
      seedCol: String, keep: Seq[String], out: String): String = {
    val k = keep.mkString(", ")
    s"""${name}_a AS MATERIALIZED (
  SELECT $k, ${mixH(seedCol, mixK(vCol))} AS ra FROM $src),
${avalCtes(name, s"${name}_a", "ra", "4", keep, out)}"""
  }

  /** MinhashSigner's affine coefficients (fixed seeds, mod 2^31-1). */
  private val coeffs: Seq[(Int, Long, Long)] = (0 until 16).map { i =>
    (i, (1103515245L + 12345L * i) % P31, (2654435761L + 40503L * i) % P31)
  }

  /** q22_minhash_pairs: shingle → scala-murmur base → affine minhash
    * (16 hashes) → Spark-hash LSH buckets (4 bands) → candidates →
    * est_jaccard (matching fraction). Bit-identical to
    * Dedup.minhashLshPairs(shingleN=3, numHashes=16, bands=4). */
  lazy val q22: String = {
    val cvals = coeffs.map { case (j, a, b) => s"($j, $a, $b)" }
      .mkString(",\n           ")
    val keepB = Seq("doc_id", "band", "m0", "m1", "m2", "m3")
    val bucketCtes = Seq(
      hashLongCtes("bk0", "bandvals", "m0", "42", keepB, "s0"),
      hashLongCtes("bk1", "bk0", "m1", "s0", keepB :+ "s0", "s1"),
      hashLongCtes("bk2", "bk1", "m2", "s1", keepB :+ "s1", "s2"),
      hashLongCtes("bk3", "bk2", "m3", "s2", keepB :+ "s2", "s3"),
      hashIntCtes("buckets", "bk3", "band", "s3",
        Seq("doc_id", "band"), "bucket")).mkString(",\n")
    s"""WITH RECURSIVE
w AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS ws
  FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(ws) - 2, 0) + 1),
      i -> array_to_string(ws[i:i+2], ' '))) AS shingle
    FROM w)),
ush AS MATERIALIZED (SELECT DISTINCT shingle FROM sh),
${stringHashCtes("ush", "shingle", 0x12345678L, 0x9abcdef0L & 0xffffffffL, Seq.empty)},
shb AS MATERIALIZED (
  SELECT s AS shingle,
    ((((h1f * $M32::HUGEINT + h2f) - CASE WHEN h1f >= 2147483648 THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END) % $P31) + $P31) % $P31 AS base
  FROM fh2),
xs AS MATERIALIZED (
  SELECT sh.doc_id, shb.base FROM sh JOIN shb USING (shingle)),
sig AS MATERIALIZED (
  SELECT doc_id, j, min((a::HUGEINT * base + b) % $P31)::BIGINT AS mh
  FROM xs CROSS JOIN (VALUES
           $cvals) c(j, a, b)
  GROUP BY doc_id, j),
bandvals AS MATERIALIZED (
  SELECT doc_id, (j // 4)::BIGINT AS band,
    min(CASE WHEN j % 4 = 0 THEN mh END) AS m0,
    min(CASE WHEN j % 4 = 1 THEN mh END) AS m1,
    min(CASE WHEN j % 4 = 2 THEN mh END) AS m2,
    min(CASE WHEN j % 4 = 3 THEN mh END) AS m3
  FROM sig GROUP BY doc_id, j // 4),
$bucketCtes,
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id)
SELECT c.id_a, c.id_b,
  round(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0 + 1e-9, 4) AS est_jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b AND sb.j = sa.j
GROUP BY c.id_a, c.id_b"""
  }

  /** q23_simhash_pairs: per-word scala-murmur 64-bit hash (two seeds),
    * occurrence-weighted bit votes → 64-bit signature → 8×8-bit band
    * blocking → hamming ≤ 7. Bit-identical to
    * Dedup.simhashPairs(maxHamming=7). */
  lazy val q23: String = {
    s"""WITH RECURSIVE
w AS (
  SELECT doc_id, unnest(list_filter(
    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS word
  FROM documents),
wc AS MATERIALIZED (
  SELECT doc_id, word, count(*)::BIGINT AS cnt FROM w GROUP BY doc_id, word),
uw AS MATERIALIZED (SELECT DISTINCT word FROM wc),
${stringHashCtes("uw", "word", 0x9747b28cL & 0xffffffffL, 0x85ebca6bL, Seq.empty)},
wh AS MATERIALIZED (
  SELECT s AS word, (h1f::HUGEINT * $M32 + h2f) AS u64 FROM fh2),
votes AS MATERIALIZED (
  SELECT wc.doc_id, b.i,
    sum(wc.cnt * (2 * ((wh.u64 // (1::HUGEINT << b.i)) % 2)::BIGINT - 1)) AS v
  FROM wc JOIN wh ON wc.word = wh.word
  CROSS JOIN (SELECT unnest(range(0, 64)) AS i) b
  GROUP BY wc.doc_id, b.i),
sig AS MATERIALIZED (
  SELECT doc_id,
    sum(CASE WHEN v > 0 THEN (1::HUGEINT << i) ELSE 0::HUGEINT END) AS usig
  FROM votes GROUP BY doc_id),
-- wordless/null-text docs: simhashUdf assigns signature 0L and they
-- PAIR with each other (hamming 0) — the left join keeps them
ssig AS MATERIALIZED (
  SELECT d.doc_id,
    (u2 - CASE WHEN u2 >= (1::HUGEINT << 63) THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END)::BIGINT AS sig,
    u2 AS usig
  FROM (SELECT doc_id, coalesce(sig.usig, 0::HUGEINT) AS u2
        FROM (SELECT doc_id FROM documents) d0 LEFT JOIN sig USING (doc_id)) d),
banded AS MATERIALIZED (
  SELECT doc_id, sig, b.band, ((usig // (1::HUGEINT << (b.band * 8))) % 256)::BIGINT AS bucket
  FROM ssig CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, a.sig AS sh_a, b.doc_id AS id_b, b.sig AS sh_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 7"""
  }
}
