package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Curation, Dedup, Events, LanguageModel, Multimodal, RangeJoin, Similarity, Stats, TextAnalysis, TextClassify, TextSearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an implemented operator surface; entries
  * with a matching [[oracleSql]] key are hash-checked against DuckDB on
  * the same parquet tables (column names must align — aggregates are
  * aliased identically on both sides; float aggregates go through
  * decimal casts so the result is summation-order-independent).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Sources.table(spark, dir, name)

  /** Filesystem-safe tag for temp artifact paths (index/store/model
    * scratch the persisted-workflow queries write then probe). The
    * PID component keeps two concurrent harness runs over the SAME
    * dataset dir from overwriting each other's artifacts mid-probe;
    * within one process the tag is stable, so bench re-runs of a
    * query reuse (overwrite) their own scratch as intended. */
  private val runPid: String = java.lang.ProcessHandle.current().pid().toString
  private def runTag(dir: String): String =
    "p" + runPid + "_" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** PSL rules file for q_pipeline_domaingraph_psl: the
    * q_graph_domaingraph_psl rule matrix (wildcard, exception,
    * private-domain rules) in publicsuffix.org format. Written ONCE
    * per JVM (lazy) with deleteOnExit — bench sweeps invoke each
    * query many times, and a fresh temp dir per invocation litters
    * the temp filesystem across passes. */
  private lazy val pslRulesFile: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-psl")
    val rules = dir.resolve("rules.dat")
    java.nio.file.Files.write(rules,
      ("// test list: the q_graph_domaingraph_psl rule matrix\n" +
        "com\nnet\norg\nexample.com\n*.example.org\n" +
        "!other.example.org\n").getBytes("UTF-8"))
    rules.toFile.deleteOnExit()
    dir.toFile.deleteOnExit()
    rules.toString
  }

  /** Synthetic-but-REAL 8-bit mono PCM WAV corpus over the first 400
    * doc ids — the audio-dedup fixture. Group g = doc_id % 40 shares
    * a deterministic base signal (integer arithmetic only, so the
    * DuckDB oracle replays the samples digit-exact); each doc
    * perturbs the bytes of ONE frame (frame doc_id % 65, +1 mod 256),
    * which moves at most two consecutive-frame energy comparisons —
    * within-group fingerprints sit at Hamming ≤ 4 by construction.
    * The WAV container is genuine RIFF (the operator really parses
    * headers and PCM), built distributed in a Dataset map. */
  private def wavAssetsFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = t(s, dir, "documents")
      .filter(col("doc_id") < 400)
      .select(col("doc_id").cast("long")).as[Long]
    val assets = ids.map { id =>
      val g = (id % 40).toInt
      val p = (id % 65).toInt
      val n = 65 * 32
      val pcm = new Array[Byte](n)
      var t0 = 0
      while (t0 < n) {
        val base = (g * 37 + (t0 * t0) % 97 + (t0 % 17) * (g % 11)) % 256
        val b = if (t0 / 32 == p) (base + 1) % 256 else base
        pcm(t0) = b.toByte
        t0 += 1
      }
      val bb = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("ASCII"))
        .put("fmt ".getBytes("ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
        .put("data".getBytes("ASCII")).putInt(n)
        .put(pcm)
      (id, bb.array())
    }.toDF("id", "content")
    assets.select(col("id"), col("content"),
      struct(lit("audio/wav").as("mime"), lit("synth").as("source"),
        octet_length(col("content")).cast("long").as("n_bytes"))
        .as("meta"))
  }

  /** Synthetic-but-REAL AVI corpus over the first 200 doc ids — the
    * video-dedup fixture: genuine RIFF/AVI containers (the operator
    * really walks LIST-movi chunks) holding four 16×16 top-down 24-bit
    * grayscale BMP `00db` frames whose pixels follow an integer
    * grammar (group g = doc_id % 20 shares the base frames, so the
    * DuckDB oracle replays every pixel, block sum, and hash bit
    * digit-exact). Each doc perturbs ONE 2×2 block (doc_id % 63) of
    * ONE frame (doc_id % 4) by +1 mod 256 per pixel — moving at most
    * two consecutive-block comparisons in that frame's grid-delta
    * hash, so within-group sequences sit at max-hamming ≤ 4 by
    * construction. */
  private def aviAssetsFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id").cast("long")).as[Long]
    val assets = ids.map { id =>
      val g = (id % 20).toInt
      val pb = (id % 63).toInt // perturbed block
      val pf = (id % 4).toInt  // perturbed frame
      val frames = (0 until 4).map { f =>
        val px = new Array[Byte](54 + 16 * 48)
        val fb = java.nio.ByteBuffer.wrap(px)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        fb.put('B'.toByte).put('M'.toByte).putInt(54 + 16 * 48)
          .putInt(0).putInt(54)
          .putInt(40).putInt(16).putInt(-16) // negative = top-down
          .putShort(1).putShort(24)
          .putInt(0).putInt(16 * 48)
          .putInt(0).putInt(0).putInt(0).putInt(0)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val blk = (y / 2) * 8 + (x / 2)
            val base = (g * 37 + f * 29 + (x * x + 3 * y) % 97 +
              (y % 5) * (g % 7)) % 256
            val v = if (f == pf && blk == pb) (base + 1) % 256 else base
            val off = 54 + y * 48 + x * 3
            px(off) = v.toByte       // B
            px(off + 1) = v.toByte   // G
            px(off + 2) = v.toByte   // R (grayscale)
            x += 1
          }
          y += 1
        }
        px
      }
      val moviSz = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + moviSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ASCII")).putInt(4 + 8 + moviSz)
        .put("AVI ".getBytes("ASCII"))
        .put("LIST".getBytes("ASCII")).putInt(moviSz)
        .put("movi".getBytes("ASCII"))
      frames.foreach { f =>
        bb.put("00db".getBytes("ASCII")).putInt(f.length).put(f)
        if ((f.length & 1) == 1) bb.put(0.toByte)
      }
      (id, bb.array())
    }.toDF("id", "content")
    assets.select(col("id"), col("content"),
      struct(lit("video/avi").as("mime"), lit("synth").as("source"),
        octet_length(col("content")).cast("long").as("n_bytes"))
        .as("meta"))
  }

  /** The CDC changeset the apply-changes pair derives from orders:
    * upserts at seq 1 (%3 keys), superseding upserts at seq 2 (%9 —
    * a subset, so latest-wins is exercised), deletes at seq 3 (%5 —
    * including keys absent from the %4-filtered snapshot: no-ops). */
  private def cdcChangesFixture(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val up1 = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), lit(1L).as("seq"),
        lit("upsert").as("op"), col("o_custkey"),
        lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 10).as("o_totalprice"))
    val up2 = orders.filter(col("o_orderkey") % 9 === 0)
      .select(col("o_orderkey"), lit(2L).as("seq"),
        lit("upsert").as("op"), col("o_custkey"),
        lit("V").as("o_orderstatus"),
        (col("o_totalprice") + 20).as("o_totalprice"))
    val del = orders.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), lit(3L).as("seq"),
        lit("delete").as("op"), lit(null).cast("long").as("o_custkey"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"))
    up1.unionByName(up2).unionByName(del)
  }

  /** The q_text_sentences / q_text_readability fixture prefix: one
    * string that exercises every rule of the segmentation chain —
    * guarded abbreviations, a chained decimal (both protect passes),
    * multi-punct boundaries, ? and ! terminators, and an UNguarded
    * abbreviation ("al.") that is split by design. */
  private val sentencePrefix: String =
    "Dr. Smith et al. paid 3.14 on day 2. Was it e.g. a No. 7 fig? " +
      "Yes! Meanwhile v1.2.3 shipped... "

  private def sentenceSeeded(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit(sentencePrefix), col("text")).as("text"))

  /** Unrolled DuckDB replica of [[graft.operators.TextAnalysis.trainBpe]]
    * for a fixed merge count: round k picks the top pair from the w{k}
    * vocabulary and w{k+1} applies it with the same greedy left-to-right
    * non-overlapping fold. The fold accumulates a SPACE-DELIMITED string
    * (DuckDB's list_reduce accumulator must match the element type, so
    * it can't build a list of strings): symbols never contain spaces —
    * they come from a space-split — so the `' ' || l` suffix test is an
    * exact trailing-SYMBOL test, equivalent to Spark's
    * element_at(acc, -1) check. */
  private def bpeOracleSql(numMerges: Int): String = {
    val rounds = (0 until numMerges).map { k =>
      s"""p$k AS (
  SELECT syms[i+1] AS l, syms[i+2] AS r, CAST(sum(cnt) AS BIGINT) AS pc
  FROM w$k, unnest(range(CAST(len(syms) - 1 AS BIGINT))) AS t(i)
  GROUP BY 1, 2
), t$k AS (
  SELECT CAST(${k + 1} AS INT) AS merge_rank, l, r, l || r AS merged, pc
  FROM p$k ORDER BY pc DESC, l, r LIMIT 1
), w${k + 1} AS (
  SELECT cnt,
    string_split(list_reduce(list_prepend('', syms), (acc, x) ->
      CASE WHEN acc = '' THEN x
           WHEN x = m.r AND (acc = m.l OR
                right(acc, length(m.l) + 1) = ' ' || m.l)
           THEN left(acc, length(acc) - length(m.l)) || m.merged
           ELSE acc || ' ' || x END), ' ') AS syms
  FROM w$k CROSS JOIN t$k m
)"""
    }.mkString(", ")
    val union = (0 until numMerges)
      .map(k => s"SELECT * FROM t$k").mkString(" UNION ALL ")
    s"""WITH w0 AS (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
    [substring(token, i, 1) FOR i IN range(1, length(token) + 1)] AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
), $rounds
SELECT merge_rank, l AS left_sym, r AS right_sym, merged, pc AS pair_count
FROM ($union)"""
  }

  /** Unrolled DuckDB replica of trainBpe + bpeTokenize composed: the
    * same merge rounds as [[bpeOracleSql]] but carrying the TOKEN key
    * through every rewrite, so the final vocabulary frame w{n} IS the
    * encoded form of each distinct word; per-doc subword rows then come
    * from an ordered word unnest joined against it. Replicates
    * (id, word_pos, sym_pos, subword) exactly — both folds are the same
    * greedy left-to-right non-overlapping merge. */
  /** The per-round merge CTEs + the encode tail shared by the char
    * and byte-level BPE oracles — ONE statement of the merge
    * semantics, two seed alphabets. */
  private def bpeMergeRoundsSql(numMerges: Int): String =
    (0 until numMerges).map { k =>
      s"""p$k AS (
  SELECT syms[i+1] AS l, syms[i+2] AS r, CAST(sum(cnt) AS BIGINT) AS pc
  FROM w$k, unnest(range(CAST(len(syms) - 1 AS BIGINT))) AS t(i)
  GROUP BY 1, 2
), t$k AS (
  SELECT l, r, l || r AS merged
  FROM p$k ORDER BY pc DESC, l, r LIMIT 1
), w${k + 1} AS (
  SELECT token, cnt,
    string_split(list_reduce(list_prepend('', syms), (acc, x) ->
      CASE WHEN acc = '' THEN x
           WHEN x = m.r AND (acc = m.l OR
                right(acc, length(m.l) + 1) = ' ' || m.l)
           THEN left(acc, length(acc) - length(m.l)) || m.merged
           ELSE acc || ' ' || x END), ' ') AS syms
  FROM w$k CROSS JOIN t$k m
)"""
    }.mkString(", ")

  private def bpeEncodeTailSql(numMerges: Int, docFilter: String): String =
    s"""words AS (
  SELECT doc_id AS id, CAST(i - 1 AS INT) AS word_pos, w[CAST(i AS INT)] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE $docFilter),
       unnest(range(1, CAST(len(w) + 1 AS BIGINT))) AS t(i)
  WHERE w[CAST(i AS INT)] <> ''
)
SELECT words.id, words.word_pos, CAST(j - 1 AS INT) AS sym_pos,
  syms[CAST(j AS INT)] AS subword
FROM words JOIN w$numMerges USING (token),
     unnest(range(1, CAST(len(syms) + 1 AS BIGINT))) AS u(j)"""

  /** Byte-level BPE encode oracle: the same merge rounds + tail, the
    * seed symbols remapped UTF-8 BYTES (hex pairs → the GPT-2
    * byte↔unicode table shipped as a 256-slot list literal) instead
    * of characters. */
  private def bpeBytesEncodeOracleSql(numMerges: Int,
                                      docFilter: String): String = {
    val alphaSql = graft.operators.TextAnalysis.byteAlphabet
      .map(s => "'" + s.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""WITH alpha AS (SELECT $alphaSql AS a),
w0 AS (
  SELECT token, cnt,
    [ a[('0x' || substr(h, 2*i-1, 2))::INT + 1]
      FOR i IN range(1, octet_length(encode(token)) + 1) ] AS syms
  FROM (SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token <> '' GROUP BY token),
       alpha, LATERAL (SELECT hex(encode(token)) AS h)
), ${bpeMergeRoundsSql(numMerges)},
${bpeEncodeTailSql(numMerges, docFilter)}"""
  }

  private def bpeEncodeOracleSql(numMerges: Int, docFilter: String): String =
    s"""WITH w0 AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt,
    [substring(token, i, 1) FOR i IN range(1, length(token) + 1)] AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
), ${bpeMergeRoundsSql(numMerges)},
${bpeEncodeTailSql(numMerges, docFilter)}"""

  /** Shared by q_text_bm25 and q_text_bm25_indexed: the persisted
    * inverted index reproduces direct BM25 scoring exactly. */
  /** Unrolled DuckDB replica of trainUnigram (Kudo hard-EM): seed
    * substring statistics + forced single chars, then per EM round a
    * fully unrolled Viterbi DP (best-score CTE per end position
    * j = 1..maxWordLen, tie-break ORDER BY score DESC, len ASC —
    * exactly the compiled expression's ascending-length strict-`>`
    * scan), an unrolled path walk-back, integer expected counts, and
    * the same char-floor M-step. Log-probs are round-9 ln terms, so
    * every DP score is the same double in both engines. Multi-
    * referenced CTEs are MATERIALIZED (the kCore discipline). */
  private def unigramTrainCtes(seedTopN: Int, maxPieceLen: Int,
                               keepN: Int, emRounds: Int,
                               maxWordLen: Int): String = {
    val P = maxPieceLen
    val head =
      s"""uwords AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  WHERE len(w) >= 1 AND len(w) <= $maxWordLen GROUP BY 1
), usubw AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS weight FROM (
    SELECT substr(w, s::INT, l::INT) AS piece, cnt
    FROM uwords,
         LATERAL unnest(range(1, len(w) + 1)) ts(s),
         LATERAL unnest(range(1, least($P, len(w) - s + 1) + 1)) tl(l)
  ) GROUP BY 1
), useed AS MATERIALIZED (
  SELECT piece, weight FROM (
    SELECT piece, weight FROM usubw
    ORDER BY weight DESC, piece LIMIT $seedTopN)
  UNION
  SELECT piece, weight FROM usubw WHERE len(piece) = 1
), uv0 AS MATERIALIZED (
  SELECT piece, round(ln(weight), 9) -
    (SELECT round(ln(sum(weight)), 9) FROM useed) AS lp
  FROM useed
)"""
    val rounds = (1 to emRounds).map { r =>
      val dp = (1 to maxWordLen).map { j =>
        s"""ub${r}_$j AS (
  SELECT w, j, s, l FROM (
    SELECT c.w, c.j, b.s + c.lp AS s, c.l,
      row_number() OVER (PARTITION BY c.w
        ORDER BY (b.s + c.lp) DESC, c.l ASC) AS rn
    FROM ucand$r c JOIN uball${r}_${j - 1} b
      ON b.w = c.w AND b.j = c.j - c.l
    WHERE c.j = $j
  ) WHERE rn = 1
), uball${r}_$j AS MATERIALIZED (
  SELECT * FROM uball${r}_${j - 1} UNION ALL SELECT * FROM ub${r}_$j
)"""
      }.mkString(", ")
      val walk = (1 to maxWordLen).map { k =>
        s"""ustep${r}_$k AS MATERIALIZED (
  SELECT wk.w, b.l, substr(wk.w, (b.j - b.l + 1)::INT, b.l::INT) AS piece,
         (wk.j - b.l)::INT AS nj
  FROM uwalk${r}_${k - 1} wk
  JOIN uball${r}_$maxWordLen b ON b.w = wk.w AND b.j = wk.j
  WHERE wk.j > 0
), uwalk${r}_$k AS (SELECT w, nj AS j FROM ustep${r}_$k)"""
      }.mkString(", ")
      val emits = (1 to maxWordLen)
        .map(k => s"SELECT w, piece FROM ustep${r}_$k")
        .mkString(" UNION ALL ")
      s"""ucand$r AS MATERIALIZED (
  SELECT x.w, x.j, x.l, v.lp FROM (
    SELECT w.w, ts.j::INT AS j, tl.l::INT AS l,
           substr(w.w, (ts.j - tl.l + 1)::INT, tl.l::INT) AS piece
    FROM uwords w,
         LATERAL unnest(range(1, len(w.w) + 1)) ts(j),
         LATERAL unnest(range(1, least($P, ts.j) + 1)) tl(l)
  ) x JOIN uv${r - 1} v ON v.piece = x.piece
), uball${r}_0 AS MATERIALIZED (
  SELECT w, 0 AS j, 0.0 AS s, 0 AS l FROM uwords
), $dp, uwalk${r}_0 AS (
  SELECT w, len(w)::INT AS j FROM uwords
), $walk, ucnts$r AS MATERIALIZED (
  SELECT e.piece, CAST(sum(wd.cnt) AS BIGINT) AS c
  FROM ($emits) e JOIN uwords wd ON wd.w = e.w GROUP BY 1
), uinv$r AS MATERIALIZED (
  SELECT piece, c AS weight FROM ucnts$r WHERE c > 0
  UNION ALL
  SELECT ch.piece, CAST(1 AS BIGINT) AS weight
  FROM (SELECT DISTINCT piece FROM useed WHERE len(piece) = 1) ch
  WHERE NOT EXISTS (SELECT 1 FROM ucnts$r c2
                    WHERE c2.piece = ch.piece AND c2.c > 0)
), uv$r AS MATERIALIZED (
  SELECT piece, round(ln(weight), 9) -
    (SELECT round(ln(sum(weight)), 9) FROM uinv$r) AS lp
  FROM uinv$r
)"""
    }.mkString(", ")
    val R = emRounds
    val prune =
      s"""ufchars AS MATERIALIZED (
  SELECT piece, weight FROM uinv$R WHERE len(piece) = 1
), ufmulti AS (
  SELECT piece, weight FROM (
    SELECT piece, weight,
      row_number() OVER (ORDER BY weight DESC, piece) AS rn
    FROM uinv$R WHERE len(piece) > 1)
  WHERE rn <= $keepN - (SELECT count(*) FROM ufchars)
), ukept AS MATERIALIZED (
  SELECT * FROM ufchars UNION ALL SELECT * FROM ufmulti
), uvocab AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY weight DESC, piece) AS INT)
      AS rank,
    piece, weight, round(ln(weight), 9) -
      (SELECT round(ln(sum(weight)), 9) FROM ukept) AS logprob
  FROM ukept
)"""
    s"$head, $rounds, $prune"
  }

  /** The q_text_unigram_encode oracle: the train CTEs, then the SAME
    * unrolled Viterbi DP against the kept vocabulary's round-9
    * log-probs over the held-out docs' distinct words, the walk-back
    * re-ordered into 0-based piece positions, joined onto per-doc word
    * instances. No UNK branch: training forces every corpus character
    * into the inventory, so the fallback can never fire here (matching
    * the expression, whose penalty path is dead on covered text). */
  private def unigramEncodeOracleSql(seedTopN: Int, maxPieceLen: Int,
                                     keepN: Int, emRounds: Int,
                                     maxWordLen: Int,
                                     docFilter: String): String = {
    val P = maxPieceLen
    val dp = (1 to maxWordLen).map { j =>
      s"""eb_$j AS (
  SELECT w, j, s, l FROM (
    SELECT c.w, c.j, b.s + c.lp AS s, c.l,
      row_number() OVER (PARTITION BY c.w
        ORDER BY (b.s + c.lp) DESC, c.l ASC) AS rn
    FROM ecand c JOIN eball_${j - 1} b ON b.w = c.w AND b.j = c.j - c.l
    WHERE c.j = $j
  ) WHERE rn = 1
), eball_$j AS MATERIALIZED (
  SELECT * FROM eball_${j - 1} UNION ALL SELECT * FROM eb_$j
)"""
    }.mkString(", ")
    val walk = (1 to maxWordLen).map { k =>
      s"""estep_$k AS MATERIALIZED (
  SELECT wk.w, $k AS stp, b.l,
         substr(wk.w, (b.j - b.l + 1)::INT, b.l::INT) AS piece,
         (wk.j - b.l)::INT AS nj
  FROM ewalk_${k - 1} wk
  JOIN eball_$maxWordLen b ON b.w = wk.w AND b.j = wk.j
  WHERE wk.j > 0
), ewalk_$k AS (SELECT w, nj AS j FROM estep_$k)"""
    }.mkString(", ")
    val emits = (1 to maxWordLen)
      .map(k => s"SELECT w, stp, piece FROM estep_$k")
      .mkString(" UNION ALL ")
    s"""WITH ${unigramTrainCtes(seedTopN, P, keepN, emRounds, maxWordLen)},
ewords AS MATERIALIZED (
  SELECT DISTINCT w[i] AS w
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE $docFilter) t,
       unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS r(i)
  WHERE len(w[i]) >= 1
), ecand AS MATERIALIZED (
  SELECT x.w, x.j, x.l, v.logprob AS lp FROM (
    SELECT w.w, ts.j::INT AS j, tl.l::INT AS l,
           substr(w.w, (ts.j - tl.l + 1)::INT, tl.l::INT) AS piece
    FROM ewords w,
         LATERAL unnest(range(1, len(w.w) + 1)) ts(j),
         LATERAL unnest(range(1, least($P, ts.j) + 1)) tl(l)
  ) x JOIN uvocab v ON v.piece = x.piece
), eball_0 AS MATERIALIZED (
  SELECT w, 0 AS j, 0.0 AS s, 0 AS l FROM ewords
), $dp, ewalk_0 AS (
  SELECT w, len(w)::INT AS j FROM ewords
), $walk, esegs AS MATERIALIZED (
  SELECT w, CAST(count(*) OVER (PARTITION BY w) - stp AS INT) AS ppos,
         piece
  FROM ($emits) e
), einst AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS wpos, w[i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE $docFilter) t,
       unnest(range(1, CAST(len(w) AS BIGINT) + 1)) AS r(i)
  WHERE len(w[i]) >= 1
)
SELECT i.doc_id, i.wpos, s.ppos, s.piece
FROM einst i JOIN esegs s ON s.w = i.word"""
  }

  /** Shared link-extraction CTE chain for the q_text_links /
    * q_text_anchors oracles: the same page wrapper as the entries,
    * the same anchor-fragment regexes, href-quote fallbacks, entity
    * decode, drop rules, base-URL resolution, and bounded dot-segment
    * squash — ending in `lk(doc_id, link_pos, href, href_abs,
    * anchor)`. `baseSql` parameterizes the page's own URL so the
    * host-graph entry can vary the source host per document. */
  private def linksOracleCte(
      baseSql: String = "'https://www.example.com/dir' || " +
        "CAST(doc_id % 5 AS VARCHAR) || '/page/index.html'"): String =
    raw"""ldoc AS (
      |  SELECT doc_id,
      |    '<html><body><nav><a href="/">Home</a> ' ||
      |    '<a href=''/about/''>About&nbsp;Us</a></nav>' ||
      |    '<p>see <a href="../sibling.html">the <b>sibling</b></a> ' ||
      |    'and <a href="//cdn.example.net/lib.js">cdn</a> and ' ||
      |    '<a href="https://other.example.org/x?id=' ||
      |    CAST(doc_id AS VARCHAR) ||
      |    '">doc link</a> and <a href="#frag">skip</a> ' ||
      |    '<a href="mailto:x@y">skip too</a></p></body></html>' AS html,
      |    $baseSql AS base
      |  FROM documents
      |), lfrag AS (
      |  SELECT doc_id, base, CAST(i - 1 AS INT) AS link_pos,
      |         frags[i] AS frag
      |  FROM (SELECT doc_id, base, regexp_extract_all(html,
      |          '(?is)<a\b[^>]*>.*?</a\s*>', 0) AS frags
      |        FROM ldoc) t,
      |       unnest(range(1, CAST(len(frags) AS BIGINT) + 1)) AS r(i)
      |), lhref AS (
      |  SELECT doc_id, base, link_pos,
      |    CASE
      |      WHEN regexp_extract(frag,
      |        '(?is)\bhref\s*=\s*"([^"]*)"', 1) <> ''
      |      THEN regexp_extract(frag, '(?is)\bhref\s*=\s*"([^"]*)"', 1)
      |      WHEN regexp_extract(frag,
      |        '(?is)\bhref\s*=\s*''([^'']*)''', 1) <> ''
      |      THEN regexp_extract(frag,
      |        '(?is)\bhref\s*=\s*''([^'']*)''', 1)
      |      ELSE regexp_extract(frag,
      |        '(?is)\bhref\s*=\s*([^\s"''>]+)', 1) END AS href,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(regexp_extract(frag,
      |          '(?is)<a\b[^>]*>(.*)</a\s*>', 1),
      |          '(?s)<[^>]*>', ' ', 'g'),
      |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |        '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
      |      '\s+', ' ', 'g')) AS anchor
      |  FROM lfrag
      |), lres AS (
      |  SELECT doc_id, link_pos, href, anchor,
      |    CASE
      |      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://')
      |        THEN href
      |      WHEN starts_with(href, '//')
      |        THEN regexp_extract(base, '^([A-Za-z]+):', 1) || ':'
      |          || href
      |      WHEN starts_with(href, '/')
      |        THEN regexp_extract(base, '^([A-Za-z]+://[^/?#]*)', 1)
      |          || href
      |      ELSE regexp_extract(base,
      |        '^([A-Za-z]+://[^/?#]*(?:[^?#]*/)?)', 1) || href
      |    END AS joined
      |  FROM lhref
      |  WHERE href <> ''
      |    AND NOT regexp_matches(lower(href),
      |      '^(javascript|mailto|tel|data):')
      |    AND NOT starts_with(href, '#')
      |), lk AS MATERIALIZED (
      |  SELECT doc_id, link_pos, href,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(joined, '/\./', '/', 'g'),
      |      '/[^/.][^/]*/\.\./', '/', 'g'),
      |      '/[^/.][^/]*/\.\./', '/', 'g'),
      |      '/[^/.][^/]*/\.\./', '/', 'g'),
      |      '/[^/.][^/]*/\.\./', '/', 'g') AS href_abs,
      |    anchor
      |  FROM lres
      |)""".stripMargin

  /** Dirichlet query-likelihood replica: same candidate restriction,
    * same qconst/delta/length decomposition, every piece a round-9
    * DECIMAL sum or a fixed-shape ln both engines evaluate alike. */
  private val qlOracleSql: String =
    """WITH q(query_id, qtext) AS (
      |  VALUES (0, 'spark join fast'), (1, 'vector scan slow'),
      |         (2, 'customer order line'), (3, 'window agg group'),
      |         (4, 'hash merge sort batch')
      |), qt AS (
      |  SELECT DISTINCT query_id,
      |         unnest(string_split(qtext, ' ')) AS term
      |  FROM q
      |), toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), ctot AS (
      |  SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c
      |  FROM documents
      |), m AS MATERIALIZED (
      |  SELECT t.term, t.doc_id, t.dl FROM toks t
      |  WHERE t.term IN (SELECT term FROM qt)
      |), cf AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS cf FROM m GROUP BY 1
      |), post AS (
      |  SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
      |  FROM m GROUP BY 1, 2, 3
      |), qp AS (
      |  SELECT qt.query_id, qt.term,
      |    2000.0::DOUBLE * (CAST(cf.cf AS DOUBLE) / CAST(ctot.c AS DOUBLE))
      |      AS mp
      |  FROM qt JOIN cf USING (term) CROSS JOIN ctot
      |), qc AS (
      |  SELECT query_id, CAST(count(*) AS BIGINT) AS nq,
      |    CAST(sum(CAST(round(ln(mp) * 1e9) AS BIGINT)) AS BIGINT)
      |      AS qsum
      |  FROM qp GROUP BY 1
      |), dd AS (
      |  SELECT qp.query_id, p.doc_id, p.dl,
      |    CAST(sum(CAST(round((ln(CAST(p.tf AS DOUBLE) + qp.mp)
      |      - ln(qp.mp)) * 1e9) AS BIGINT)) AS BIGINT) AS dsum
      |  FROM post p JOIN qp USING (term) GROUP BY 1, 2, 3
      |), sc AS (
      |  SELECT dd.query_id, dd.doc_id,
      |    qc.qsum + dd.dsum -
      |      CAST(round((CAST(qc.nq AS DOUBLE) *
      |        ln(CAST(dd.dl AS DOUBLE) + 2000.0::DOUBLE)) * 1e9)
      |        AS BIGINT) AS u
      |  FROM dd JOIN qc USING (query_id)
      |)
      |SELECT query_id, doc_id,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY u DESC, doc_id) AS INT) AS rank,
      |  -(((-u + 500) // 1000)::DOUBLE / 1000000.0::DOUBLE) AS score
      |FROM sc QUALIFY rank <= 10""".stripMargin

  private val bm25OracleSql: String =
    """WITH q(query_id, qtext) AS (
      |  VALUES (0, 'spark join fast'), (1, 'vector scan slow'),
      |         (2, 'customer order line'), (3, 'window agg group'),
      |         (4, 'hash merge sort batch')
      |), toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(string_split(text, ' ')))::DOUBLE AS avgdl
      |  FROM documents
      |), qterms AS (
      |  SELECT DISTINCT query_id,
      |         unnest(string_split(qtext, ' ')) AS term
      |  FROM q
      |), tf AS (
      |  SELECT term, doc_id, dl, count(*)::DOUBLE AS tf
      |  FROM toks WHERE term IN (SELECT term FROM qterms)
      |  GROUP BY 1, 2, 3
      |), posting AS (
      |  SELECT tf.*, count(*) OVER (PARTITION BY term)::DOUBLE AS df
      |  FROM tf
      |), scored AS (
      |  SELECT qt.query_id, p.doc_id,
      |    sum(CAST(round(
      |      ln(1 + (s.n - p.df + 0.5) / (p.df + 0.5))
      |        * p.tf * (1.2 + 1)
      |        / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)),
      |      9) AS DECIMAL(28,9))) AS score_dec
      |  FROM posting p JOIN qterms qt USING (term), stats s
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT query_id, doc_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_dec DESC, doc_id) AS rank,
      |    round(CAST(score_dec AS DOUBLE), 6) AS score
      |  FROM scored
      |)
      |SELECT query_id, doc_id, rank, score FROM ranked
      |WHERE rank <= 10""".stripMargin

  /** Unrolled DuckDB replica of
    * [[graft.operators.TextClassify.trainLogisticHashed]]: each
    * gradient-descent round repeats the same decimal residual sums and
    * round-9 weight update, so the trained weights replicate
    * bit-for-bit at any round count — the pageRank discipline applied
    * to model training. */
  private def logregOracleSql(dim: Int, iters: Int, lr: Double,
                              labelSql: String): String = {
    val dec0 = "CAST(0 AS DECIMAL(28,9))"
    val rounds = (1 to iters).map { k =>
      s"""m$k AS (
  SELECT l.doc_id,
    CAST(round(1.0 / (1.0 + exp(-(CAST(bw.w +
        COALESCE(f.s, $dec0) AS DOUBLE)))), 9) AS DECIMAL(28,9)) -
      CAST(l.y AS DECIMAL(28,9)) AS r
  FROM labels l
  LEFT JOIN (
    SELECT feats.doc_id, CAST(sum(w.w) AS DECIMAL(28,9)) AS s
    FROM feats JOIN w${k - 1} w USING (b) GROUP BY feats.doc_id
  ) f USING (doc_id)
  CROSS JOIN (SELECT w FROM w${k - 1} WHERE b = -1) bw(w)
), g$k AS (
  SELECT b, CAST(sum(r) AS DECIMAL(28,9)) AS g
  FROM feats JOIN m$k USING (doc_id) GROUP BY b
  UNION ALL
  SELECT -1, CAST(sum(r) AS DECIMAL(28,9)) FROM m$k
), w$k AS (
  SELECT w.b, CAST(w.w - CAST(round($lr *
      CAST(COALESCE(g.g, $dec0) AS DOUBLE) / nn.n, 9)
    AS DECIMAL(28,9)) AS DECIMAL(28,9)) AS w
  FROM w${k - 1} w CROSS JOIN nn LEFT JOIN g$k g USING (b)
)"""
    }
    s"""WITH feats AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    ('0x' || substr(md5(tok), 1, 12))::BIGINT % $dim AS b
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
), labels AS MATERIALIZED (
  SELECT doc_id, CASE WHEN $labelSql THEN 1 ELSE 0 END AS y
  FROM documents
), nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
w0 AS (SELECT range AS b, $dec0 AS w FROM range(-1, $dim)),
${rounds.mkString(",\n")}
SELECT b AS feature, round(CAST(w AS DOUBLE), 6) AS weight
FROM w$iters"""
  }

  /** Train-then-score replica: the trained weights quantize through
    * the round-6 display frame (exactly what `scoreLogisticInline`
    * consumes), then every document scores as σ(bias + Σ distinct
    * bucket weights) with the same decimal margin shape. */
  private def logregScoreOracleSql(dim: Int, iters: Int, lr: Double,
                                   labelSql: String): String = {
    val train = logregOracleSql(dim, iters, lr, labelSql)
    val upToRounds = train.substring(0, train.lastIndexOf("SELECT b AS"))
    s"""$upToRounds, wq AS (
  SELECT b, CAST(round(CAST(w AS DOUBLE), 6) AS DECIMAL(28,9)) AS w
  FROM w$iters
)
SELECT l.doc_id,
  round(1.0 / (1.0 + exp(-(CAST(bw.w +
    COALESCE(f.s, CAST(0 AS DECIMAL(28,9))) AS DOUBLE)))), 6) AS p
FROM labels l
LEFT JOIN (
  SELECT feats.doc_id, CAST(sum(w.w) AS DECIMAL(28,9)) AS s
  FROM feats JOIN wq w USING (b) GROUP BY feats.doc_id
) f USING (doc_id)
CROSS JOIN (SELECT w FROM wq WHERE b = -1) bw(w)"""
  }

  /** DuckDB replica of [[graft.operators.Stats.correlationMatrix]]:
    * the same decimal-summed moments from one aggregate, the same
    * double formula shape per pair. */
  /** Replica of the integer-moment correlationMatrix: the same
    * quantization iv = round(x·10^scale) as BIGINT, moments as exact
    * HUGEINT sums (DuckDB's native 128-bit — no hi/lo split needed on
    * the oracle side; the integers are identical to the engine's
    * reconstructed decimals), one double division at the end. */
  private def corrOracleSql(table: String, cols: Seq[String],
                            scale: Int = 4): String = {
    val unit = math.pow(10.0, scale)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i <= j
    } yield (cols(i), cols(j))
    val qcols = cols.map(c =>
      s"CAST(round($c * $unit) AS BIGINT) AS $c")
    val moments =
      cols.map(c => s"sum($c) AS s_$c") ++
      pairs.map { case (a, b) => s"sum($a * $b) AS p_${a}_$b" }
    val rows = pairs.map { case (a, b) =>
      val num = s"n * p_${a}_$b - s_$a * s_$b"
      val va = s"(n * p_${a}_$a - s_$a * s_$a)"
      val vb = s"(n * p_${b}_$b - s_$b * s_$b)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
  CASE WHEN $va > 0 AND $vb > 0
    THEN round(($num)::DOUBLE / (sqrt($va::DOUBLE) * sqrt($vb::DOUBLE)), 6)
  END AS corr FROM m"""
    }
    s"""WITH q AS (
  SELECT ${qcols.mkString(",\n    ")} FROM $table
), m AS (
  SELECT count(*) AS n, ${moments.mkString(",\n    ")}
  FROM q
)
${rows.mkString("\nUNION ALL ")}"""
  }

  /** Unrolled DuckDB replica of [[graft.operators.Graph.pageRank]]:
    * each iteration is a CTE repeating the same round-9 double
    * contribution + DECIMAL(28,9) sum the operator computes, so the
    * ranks replicate bit-for-bit at any iteration count. */
  /** Replica of the integer-unit pageRank: masses are whole 1e-9
    * units summed as BIGINT (exact), per-edge contributions use the
    * identical IEEE expression shape, and the display rounding is
    * integer (u + 500) // 1000 — no float tie anywhere. */
  /** Unrolled DuckDB replica of Graph.hits: same 1e-9-lattice unit
    * masses, same per-half-step L1 normalization as one fixed-shape
    * double expression, same integer display rounding. */
  /** The deterministic-walk replay CTEs over the sparse (qty > 45)
    * supplier-part graph: sorted adjacency + the hash48(start|cur|k|
    * seed) mod degree pick, hop-unrolled by DuckDB's recursion —
    * shared by the all-nodes corpus, the %17-seeded slice, and the
    * skip-gram pair oracles. `seedSelect` must yield one `node`
    * column (walk starts). */
  private def walksOracleCtes(seedSelect: String): String =
    s"""WITH RECURSIVE
       |g0 AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |         CAST(l_partkey + 10000000 AS BIGINT) AS dst
       |  FROM lineitem WHERE l_quantity > 45),
       |sym AS MATERIALIZED (
       |  SELECT src, dst FROM g0 WHERE src != dst
       |  UNION
       |  SELECT dst AS src, src AS dst FROM g0 WHERE src != dst),
       |adj AS MATERIALIZED (
       |  SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY dst)
       |      AS idx,
       |    count(*) OVER (PARTITION BY src) AS deg
       |  FROM sym),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM sym
       |    UNION ALL SELECT dst FROM sym)),
       |walk(start, step, node) AS (
       |  SELECT node AS start, 0 AS step, node FROM ($seedSelect)
       |  UNION ALL
       |  SELECT w.start, w.step + 1 AS step, a.dst AS node
       |  FROM walk w JOIN adj a ON a.src = w.node
       |   AND a.idx = 1 + (('0x' || substring(md5(
       |       CAST(w.start AS VARCHAR) || '|' ||
       |       CAST(w.node AS VARCHAR) || '|' ||
       |       CAST(w.step + 1 AS VARCHAR) || '|' || 's42'),
       |       1, 12))::BIGINT % a.deg)
       |  WHERE w.step < 3)""".stripMargin

  /** node2vec second-order walk replay: the weighted directed-edge
    * successor table (integer p/q lattice weights, cumulative
    * intervals in sorted-x order) as plain CTEs, then the hop
    * recursion draws with the same hash grammar. Base term carries
    * BOTH step-0 and the uniform step-1 hop (windows are not allowed
    * in the recursive term, and step 1 has no prev). */
  private def node2vecOracleSql(steps: Int, p: Int, q: Int,
                                seed: String,
                                seedSelect: String =
                                  "SELECT node FROM nodes"): String = {
    def h(parts: String): String =
      s"('0x' || substring(md5($parts), 1, 12))::BIGINT"
    val rPick = h("CAST(w.start AS VARCHAR) || '|' || " +
      "CAST(w.prev AS VARCHAR) || '|' || CAST(w.node AS VARCHAR) " +
      s"|| '|' || CAST(w.step + 1 AS VARCHAR) || '|' || '$seed'")
    s"""WITH RECURSIVE
       |g0 AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |         CAST(l_partkey + 10000000 AS BIGINT) AS dst
       |  FROM lineitem WHERE l_quantity > 45),
       |sym AS MATERIALIZED (
       |  SELECT src, dst FROM g0 WHERE src != dst
       |  UNION
       |  SELECT dst AS src, src AS dst FROM g0 WHERE src != dst),
       |adj AS MATERIALIZED (
       |  SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY dst) AS idx,
       |    count(*) OVER (PARTITION BY src) AS deg
       |  FROM sym),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM sym
       |    UNION ALL SELECT dst FROM sym)),
       |esucc AS MATERIALIZED (
       |  SELECT i.src AS t, i.dst AS v, o.dst AS x,
       |    CASE WHEN o.dst = i.src THEN $q
       |         WHEN EXISTS (SELECT 1 FROM sym s
       |                      WHERE s.src = i.src AND s.dst = o.dst)
       |           THEN ${p * q}
       |         ELSE $p END AS w
       |  FROM sym i JOIN sym o ON o.src = i.dst),
       |ecum AS MATERIALIZED (
       |  SELECT t, v, x, w,
       |    SUM(w) OVER (PARTITION BY t, v ORDER BY x) - w AS cumb,
       |    SUM(w) OVER (PARTITION BY t, v) AS total
       |  FROM esucc),
       |seeds AS MATERIALIZED ($seedSelect),
       |walk(start, step, prev, node) AS (
       |  (SELECT node AS start, 0 AS step,
       |          CAST(NULL AS BIGINT) AS prev, node FROM seeds
       |   UNION ALL
       |   SELECT n.node, 1, n.node, a.dst
       |   FROM seeds n JOIN adj a ON a.src = n.node
       |    AND a.idx = 1 + (${h("CAST(n.node AS VARCHAR) || '|' || " +
             s"CAST(n.node AS VARCHAR) || '|1|' || '$seed'")} % a.deg))
       |  UNION ALL
       |  SELECT w.start, w.step + 1, w.node, c.x
       |  FROM walk w JOIN ecum c ON c.t = w.prev AND c.v = w.node
       |   AND ($rPick % c.total) >= c.cumb
       |   AND ($rPick % c.total) < c.cumb + c.w
       |  WHERE w.step >= 1 AND w.step < $steps)
       |SELECT start, step, node FROM walk""".stripMargin
  }

  /** Full node2vec-training replay: seeded walks → pairs → negative
    * draws → hash init → `iters` unrolled full-batch GD rounds, all
    * on the exact decimal lattice (products on DECIMAL(14,9) stay
    * exactly representable; σ and the lr·g update each round-trip
    * through ONE round(·, 9), the logreg discipline). */
  private def embeddingsOracleSql(dim: Int, iters: Int, lr: Double,
                                  negK: Int, negSeed: String,
                                  eSeed: String,
                                  tailSql: String = ""): String = {
    val d0 = "CAST(0 AS DECIMAL(14,9))"
    // single line: interpolated multi-line SQL whose lines begin
    // with '||' would lose a pipe to the OUTER template's stripMargin
    def initCol(tag: String) =
      "CAST(round(CAST((('0x' || substring(md5(" +
        "CAST(v.node AS VARCHAR) || '|' || CAST(t.j AS VARCHAR) || " +
        s"'|$tag|' || '$eSeed'), 1, 12))::BIGINT % 2001 - 1000) " +
        "AS DOUBLE) / 10000.0, 9) AS DECIMAL(14,9))"
    val rounds = (1 to iters).map { i =>
      s"""sr$i AS MATERIALIZED (
         |  SELECT x.center, x.context, x.label, x.cnt,
         |    CAST(round(1.0 / (1.0 + exp(-(CAST(SUM(a.ew * b.cw)
         |        AS DOUBLE)))), 9) AS DECIMAL(14,9)) AS sig
         |  FROM exc x
         |  JOIN emb${i - 1} a ON a.node = x.center
         |  JOIN emb${i - 1} b ON b.node = x.context AND b.j = a.j
         |  GROUP BY x.center, x.context, x.label, x.cnt),
         |s$i AS (
         |  SELECT center, context,
         |    CAST((sig - CAST(label AS DECIMAL(14,9))) * cnt
         |      AS DECIMAL(19,9)) AS rc
         |  FROM sr$i),
         |v$i AS (
         |  SELECT s.center, s.context, s.rc, a.j, a.ew, b.cw
         |  FROM s$i s
         |  JOIN emb${i - 1} a ON a.node = s.center
         |  JOIN emb${i - 1} b ON b.node = s.context AND b.j = a.j),
         |ge$i AS (
         |  SELECT center AS node, j,
         |    CAST(round(CAST(SUM(rc * cw) AS DOUBLE) * $lr, 9)
         |      AS DECIMAL(14,9)) AS d
         |  FROM v$i GROUP BY 1, 2),
         |gc$i AS (
         |  SELECT context AS node, j,
         |    CAST(round(CAST(SUM(rc * ew) AS DOUBLE) * $lr, 9)
         |      AS DECIMAL(14,9)) AS d
         |  FROM v$i GROUP BY 1, 2),
         |emb$i AS MATERIALIZED (
         |  SELECT e.node, e.j,
         |    CAST(e.ew - COALESCE(ge.d, $d0) AS DECIMAL(14,9)) AS ew,
         |    CAST(e.cw - COALESCE(gc.d, $d0) AS DECIMAL(14,9)) AS cw
         |  FROM emb${i - 1} e
         |  LEFT JOIN ge$i ge ON ge.node = e.node AND ge.j = e.j
         |  LEFT JOIN gc$i gc ON gc.node = e.node AND gc.j = e.j)"""
        .stripMargin
    }
    s"""${walksOracleCtes(
          "SELECT DISTINCT src AS node FROM g0 WHERE src % 17 = 0")},
       |pairs AS MATERIALIZED (
       |  SELECT a.start, a.step AS center_step,
       |         b.step AS context_step,
       |         a.node AS center, b.node AS context
       |  FROM walk a JOIN walk b
       |    ON a.start = b.start AND a.step <> b.step
       |   AND abs(a.step - b.step) <= 2),
       |pvocab AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT center AS node FROM pairs
       |    UNION ALL SELECT context FROM pairs)),
       |ranked AS MATERIALIZED (
       |  SELECT node, row_number() OVER (ORDER BY
       |      ('0x' || substring(md5(CAST(node AS VARCHAR)),
       |        1, 12))::BIGINT % 256,
       |      node) AS rank
       |  FROM pvocab),
       |nv AS (SELECT count(*) AS n FROM pvocab),
       |draws AS (
       |  SELECT p.center,
       |    1 + (('0x' || substring(md5(
       |      CAST(p.start AS VARCHAR) || '|' ||
       |      CAST(p.center_step AS VARCHAR) || '|' ||
       |      CAST(p.context_step AS VARCHAR) || '|' ||
       |      CAST(j AS VARCHAR) || '|' || '$negSeed'),
       |      1, 12))::BIGINT % nv.n) AS rank
       |  FROM pairs p, nv, LATERAL unnest(range(0, $negK)) AS t(j)),
       |ex AS (
       |  SELECT center, context, 1 AS label FROM pairs
       |  UNION ALL
       |  SELECT d.center, r.node AS context, 0
       |  FROM draws d JOIN ranked r USING (rank)),
       |exc AS MATERIALIZED (
       |  SELECT center, context, label,
       |         CAST(count(*) AS DECIMAL(10,0)) AS cnt
       |  FROM ex GROUP BY 1, 2, 3),
       |vocab2 AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT center AS node FROM exc
       |    UNION ALL SELECT context FROM exc)),
       |emb0 AS MATERIALIZED (
       |  SELECT v.node, t.j,
       |    ${initCol("E")} AS ew,
       |    ${initCol("C")} AS cw
       |  FROM vocab2 v, LATERAL unnest(range(0, $dim)) AS t(j)),
       |${rounds.mkString(",\n")}
       |${if (tailSql.nonEmpty) tailSql
          else s"""SELECT node, j, round(CAST(ew AS DOUBLE), 6) AS e_w,
       |       round(CAST(cw AS DOUBLE), 6) AS c_w
       |FROM emb$iters"""}""".stripMargin
  }

  /** Loss-readout tail over [[embeddingsOracleSql]]'s sr$i CTEs: the
    * trainer's per-iteration log-loss — clamped round-9 sigmoid, ln
    * terms on the 1e-9 integer lattice, duplicate-count weighting in
    * exact BIGINTs, one final fixed-shape double division (kept
    * single-line: interpolated lines starting with a pipe would lose
    * one to the outer template's stripMargin). */
  private def embedLossTailSql(iters: Int): String = {
    val clamped = "CAST(least(greatest(sig, CAST(0.000000001 AS " +
      "DECIMAL(14,9))), CAST(0.999999999 AS DECIMAL(14,9))) AS DOUBLE)"
    (1 to iters).map { i =>
      s"SELECT $i AS iter, CAST(SUM(CAST(cnt AS BIGINT) * " +
        s"CAST(round((CASE WHEN label = 1 THEN -ln($clamped) " +
        s"ELSE -ln(1.0 - $clamped) END) * 1e9) AS BIGINT)) " +
        s"AS DOUBLE) / 1e9 AS loss FROM sr$i"
    }.mkString("\nUNION ALL\n")
  }

  private def hitsOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      s"""a${k}m AS (
  SELECT n.node, COALESCE(m.m, 0) AS m
  FROM gnodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(h.hu) AS BIGINT) AS m
    FROM ge e JOIN h${k - 1} h ON h.node = e.src GROUP BY 1) m
    ON m.node = n.node
), a${k}s AS (SELECT CAST(sum(m) AS DOUBLE) AS s FROM a${k}m),
a$k AS MATERIALIZED (
  SELECT node, CAST(round(CAST(m AS DOUBLE) / a${k}s.s * 1e9)
    AS BIGINT) AS au
  FROM a${k}m CROSS JOIN a${k}s
), h${k}m AS (
  SELECT n.node, COALESCE(m.m, 0) AS m
  FROM gnodes n LEFT JOIN (
    SELECT e.src AS node, CAST(sum(a.au) AS BIGINT) AS m
    FROM ge e JOIN a$k a ON a.node = e.dst GROUP BY 1) m
    ON m.node = n.node
), h${k}s AS (SELECT CAST(sum(m) AS DOUBLE) AS s FROM h${k}m),
h$k AS MATERIALIZED (
  SELECT node, CAST(round(CAST(m AS DOUBLE) / h${k}s.s * 1e9)
    AS BIGINT) AS hu
  FROM h${k}m CROSS JOIN h${k}s
)"""
    }.mkString(", ")
    s"""WITH ge AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS src, l_partkey + 10000000 AS dst
  FROM lineitem
), gnodes AS MATERIALIZED (
  SELECT src AS node FROM ge UNION SELECT dst FROM ge
), h0 AS (
  SELECT node, CAST(1000000000 AS BIGINT) AS hu FROM gnodes
), $rounds
SELECT n.node,
  ((a.au + 500) // 1000)::DOUBLE / 1000000.0 AS authority,
  ((h.hu + 500) // 1000)::DOUBLE / 1000000.0 AS hub
FROM gnodes n JOIN a$iters a ON a.node = n.node
JOIN h$iters h ON h.node = n.node"""
  }

  /** Weighted-PageRank-over-the-host-graph replica: the
    * q_graph_hostgraph CTE chain (extractLinks + hostOf grammar +
    * pair counts) feeds pageRankWeighted's rounds — per-edge units
    * round from the identical ru·d·w/wdeg double shape, masses fold
    * as exact BIGINTs, string node keys throughout. */
  private def weightedPageRankHostsOracleSql(iters: Int,
                                             damping: Double): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
  SELECT n2.node,
    CAST(round(1e9 * (1 - $damping::DOUBLE) / nn.n) AS BIGINT) +
      COALESCE(m.in_mass, 0) AS ru
  FROM nodes n2 CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS node,
      CAST(sum(CAST(round(CAST(p.ru AS DOUBLE) * $damping *
        CAST(e.w AS DOUBLE) / CAST(wd.wdeg AS DOUBLE))
        AS BIGINT)) AS BIGINT) AS in_mass
    FROM e JOIN wd USING (src) JOIN r${k - 1} p ON p.node = e.src
    GROUP BY 1) m ON m.node = n2.node
)"""
    }.mkString(", ")
    s"""WITH ${linksOracleCte(
      "'https://site' || CAST(doc_id % 7 AS VARCHAR) || " +
        "'.example.com/dir' || CAST(doc_id % 5 AS VARCHAR) || " +
        "'/page/index.html'")},
hp AS (
  SELECT doc_id, regexp_replace(trim(href_abs), '#.*$$', '') AS t
  FROM lk
), hg AS (
  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR)
      || '.example.com' AS src_host,
    lower(regexp_replace(regexp_replace(
      regexp_extract(t, '^(?i)https?://([^/?#]*)', 1),
      '^[^@]*@', ''), ':[0-9]*$$', '')) AS dst_host
  FROM hp
  WHERE regexp_matches(t, '^(?i)https?://[^/?#]+')
), e AS MATERIALIZED (
  SELECT src_host AS src, dst_host AS dst, count(*)::BIGINT AS w
  FROM hg WHERE dst_host IS NOT NULL AND dst_host <> ''
  GROUP BY 1, 2
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), wd AS MATERIALIZED (
  SELECT src, sum(w)::BIGINT AS wdeg FROM e GROUP BY 1
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(round(1e9 / nn.n) AS BIGINT) AS ru
  FROM nodes CROSS JOIN nn
), $rounds
SELECT r.node, ((r.ru + 500) // 1000)::DOUBLE / 1000000.0 AS rank,
  COALESCE(d.wdeg, 0) AS out_weight
FROM r$iters r LEFT JOIN wd d ON d.src = r.node"""
  }

  /** Shared CTE chain for the HyperBall oracles (q_graph_harmonic /
    * q_graph_nf): the thinned supplier-part graph, three register
    * max-merge rounds, and per-node estimate units e0..e3 on the
    * 1e-6 lattice (m = 16 fixed-shape estimate with linear counting
    * below 2.5m — mirrors Stats.hllEstimateUnits exactly). */
  private def hyperBallOracleCtes: String = {
    def roundCte(k: Int) =
      s"""r$k AS MATERIALIZED (
         |  SELECT node, bucket, max(rho) AS rho FROM (
         |    SELECT node, bucket, rho FROM r${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, r.bucket, r.rho
         |    FROM sym e JOIN r${k - 1} r ON r.node = e.src
         |  ) GROUP BY 1, 2)""".stripMargin
    def estCte(k: Int) =
      s"""e$k AS (SELECT node, round((CASE
         |    WHEN e_raw <= 40.0 AND v_zero > 0
         |    THEN 16.0 * ln(16.0 / v_zero) ELSE e_raw END) * 1e6
         |  )::BIGINT AS e FROM (
         |  SELECT node,
         |    (0.7213 / (1.0 + 1.079 / 16.0)) * 16.0 * 16.0 *
         |      562949953421312.0 /
         |      CAST(s_present + (16 - n_reg) *
         |        (1::BIGINT << 49) AS DOUBLE) AS e_raw,
         |    CAST(16 - n_reg AS DOUBLE) AS v_zero
         |  FROM (SELECT node, count(*) AS n_reg,
         |          sum((1::BIGINT << (49 - rho)))::BIGINT AS s_present
         |        FROM r$k GROUP BY 1)))""".stripMargin
    s"""WITH
       |g AS MATERIALIZED (
       |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
       |         CAST(l_partkey + 10000000 AS BIGINT) AS dst
       |  FROM lineitem WHERE l_quantity > 40),
       |sym AS MATERIALIZED (
       |  SELECT src, dst FROM g
       |  UNION
       |  SELECT dst AS src, src AS dst FROM g),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
       |hsh AS MATERIALIZED (
       |  SELECT node,
       |    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 1))::INT
       |      AS bucket,
       |    ('0x' || substr(md5(CAST(node AS VARCHAR)), 2, 12))::BIGINT
       |      AS w
       |  FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT node, bucket,
       |    CASE WHEN w = 0 THEN 49
       |         ELSE 49 - length(bin(w)) END AS rho
       |  FROM hsh),
       |${(1 to 3).map(roundCte).mkString(",\n")},
       |${(0 to 3).map(estCte).mkString(",\n")}""".stripMargin
  }

  private def pageRankOracleSql(iters: Int, damping: Double): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
  SELECT n2.node,
    CAST(round(1e9 * (1 - $damping::DOUBLE) / nn.n) AS BIGINT) +
      COALESCE(m.in_mass, 0) AS ru
  FROM nodes n2 CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS node,
      CAST(sum(CAST(round(CAST(p.ru AS DOUBLE) * $damping / deg.deg)
        AS BIGINT)) AS BIGINT) AS in_mass
    FROM e JOIN deg USING (src) JOIN r${k - 1} p ON p.node = e.src
    GROUP BY 1) m ON m.node = n2.node
)"""
    }.mkString(", ")
    s"""WITH e AS (
  SELECT DISTINCT l_suppkey AS src, l_partkey + 10000000 AS dst
  FROM lineitem
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(round(1e9 / nn.n) AS BIGINT) AS ru
  FROM nodes CROSS JOIN nn
), $rounds
SELECT r.node, ((r.ru + 500) // 1000)::DOUBLE / 1000000.0 AS rank,
  COALESCE(d.deg, 0) AS out_degree
FROM r$iters r LEFT JOIN deg d ON d.src = r.node"""
  }

  /** Personalized-PageRank replica: pageRankOracleSql with the seeded
    * start and the teleport term gated on the seed flag; |S| replaces
    * N in both constants. Same lattice, same fold shapes. */
  private def pprOracleSql(iters: Int, damping: Double): String = {
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (
  SELECT f.node,
    CASE WHEN f.is_seed THEN
      CAST(round(1e9 * (1 - $damping::DOUBLE) / ns.n) AS BIGINT)
    ELSE 0 END + COALESCE(m.in_mass, 0) AS ru
  FROM fl f CROSS JOIN ns LEFT JOIN (
    SELECT e.dst AS node,
      CAST(sum(CAST(round(CAST(p.ru AS DOUBLE) * $damping / deg.deg)
        AS BIGINT)) AS BIGINT) AS in_mass
    FROM e JOIN deg USING (src) JOIN r${k - 1} p ON p.node = e.src
    GROUP BY 1) m ON m.node = f.node
)"""
    }.mkString(", ")
    s"""WITH e AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS src, l_partkey + 10000000 AS dst
  FROM lineitem
), seeds AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS node FROM lineitem
  WHERE l_suppkey % 17 = 0
), nodes AS MATERIALIZED (
  SELECT src AS node FROM e UNION SELECT dst FROM e
  UNION SELECT node FROM seeds
), deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
), ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
fl AS MATERIALIZED (
  SELECT n2.node, s.node IS NOT NULL AS is_seed
  FROM nodes n2 LEFT JOIN seeds s ON s.node = n2.node
), r0 AS (
  SELECT node,
    CASE WHEN is_seed THEN CAST(round(1e9 / ns.n) AS BIGINT)
    ELSE 0 END AS ru
  FROM fl CROSS JOIN ns
), $rounds
SELECT r.node, ((r.ru + 500) // 1000)::DOUBLE / 1000000.0 AS rank,
  COALESCE(d.deg, 0) AS out_degree, f.is_seed
FROM r$iters r LEFT JOIN deg d ON d.src = r.node
JOIN fl f ON f.node = r.node"""
  }

  // shared by the graph entries: suppliers co-appearing on a
  // high-quantity order line (the qty>45 thinning keeps the graph
  // sparse enough for non-trivial structure)
  /** The co-order supplier graph prep as CONFIG steps: the same
    * filter → distinct → self-join (join_table against the raw
    * parquet path, the join-family convention) → canonical columns
    * as [[coOrderEdges]]; the trailing `distinct` is safe because
    * every downstream graph operator canonicalizes + distincts its
    * edge set internally. `last` is the graph step JSON to append. */
  private def coOrderCfg(dir: String, last: String): String =
    s"""[
       |  {"op": "read_table", "params": {"dir": "$dir",
       |    "table": "lineitem"}},
       |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
       |  {"op": "select",
       |   "params": {"cols": ["l_orderkey", "l_suppkey"]}},
       |  {"op": "distinct"},
       |  {"op": "with_column",
       |   "params": {"name": "src_order", "expr": "l_orderkey"}},
       |  {"op": "with_column",
       |   "params": {"name": "src", "expr": "l_suppkey"}},
       |  {"op": "select", "params": {"cols": ["src_order", "src"]}},
       |  {"op": "join_table",
       |   "params": {"path": "$dir/lineitem.parquet",
       |              "condition": "l.src_order = r.l_orderkey and l.src != r.l_suppkey and r.l_quantity > 45"}},
       |  {"op": "with_column",
       |   "params": {"name": "dst", "expr": "l_suppkey"}},
       |  {"op": "select", "params": {"cols": ["src", "dst"]}},
       |  {"op": "distinct"},
       |  $last
       |]""".stripMargin

  private def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val pe = t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    pe.as("x").join(pe.as("y"), "l_orderkey")
      .filter(col("x.l_suppkey") =!= col("y.l_suppkey"))
      .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
  }

  // the same graph in DuckDB, canonical a<b orientation
  private val coOrderUndSql =
    """pe AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      |  WHERE l_quantity > 45
      |), und AS (
      |  SELECT DISTINCT least(x.l_suppkey, y.l_suppkey) AS a,
      |                  greatest(x.l_suppkey, y.l_suppkey) AS b
      |  FROM pe x JOIN pe y ON x.l_orderkey = y.l_orderkey
      |   AND x.l_suppkey <> y.l_suppkey
      |)""".stripMargin

  // frequency-ranked substring inventory shared by the piece-tokenizer
  // oracles (topN = 200, maxPieceLen = 6)
  private val piecesVocabCte =
    """words AS (
      |  SELECT w, count(*)::BIGINT AS tf FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE len(w) >= 1 GROUP BY 1
      |), subs AS (
      |  SELECT substr(w, s::INT, l::INT) AS piece, tf
      |  FROM words,
      |       LATERAL unnest(range(1, len(w) + 1)) ts(s),
      |       LATERAL unnest(range(1, least(6, len(w) - s + 1) + 1)) tl(l)
      |), vocab AS (
      |  SELECT piece, sum(tf)::BIGINT AS weight
      |  FROM subs GROUP BY 1
      |  ORDER BY weight DESC, piece LIMIT 200
      |)""".stripMargin

  /** The q_text_pieces_encode oracle: greedy longest-match replayed as
    * a recursive CTE — each step consumes the longest vocab piece
    * prefixing the remainder (list membership against the one-row
    * vocab list), or `[UNK]` + advance 1. Deterministic, so the CTE
    * reproduces the compiled expression exactly. */
  private def piecesEncodeOracleSql: String = {
    // best match length at character position `p` (NULL = no match)
    def bl(p: String) =
      s"""list_max([l FOR l IN range(1, least(6, len(word) - $p + 1) + 1)
         |      IF list_contains(vl.pieces, substr(word, ($p)::INT, l::INT))])"""
        .stripMargin
    s"""WITH RECURSIVE $piecesVocabCte,
vl AS (SELECT list(piece) AS pieces FROM vocab),
wrds AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS wpos, w[i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 10 = 0) d,
       LATERAL unnest(range(1, len(w) + 1)) t(i)
),
tok AS (
  SELECT doc_id, wpos, word,
    1 + coalesce(${bl("1")}, 1) AS pos,
    0 AS ppos,
    CASE WHEN ${bl("1")} IS NULL THEN '[UNK]'
         ELSE substr(word, 1, (${bl("1")})::INT) END AS piece
  FROM wrds, vl WHERE len(word) >= 1
  UNION ALL
  SELECT doc_id, wpos, word,
    pos + coalesce(${bl("pos")}, 1), ppos + 1,
    CASE WHEN ${bl("pos")} IS NULL THEN '[UNK]'
         ELSE substr(word, pos::INT, (${bl("pos")})::INT) END
  FROM tok, vl WHERE pos <= len(word)
)
SELECT doc_id, wpos, CAST(ppos AS INT) AS ppos, piece FROM tok"""
  }

  /** The q_graph_kcore oracle: `rounds` peeling iterations unrolled
    * (each = degrees over the surviving edges, keep nodes ≥ k, restrict
    * edges) — extra rounds past the fixpoint are no-ops, so any
    * `rounds` ≥ the convergence depth replicates the operator
    * exactly. */
  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    // each eR references eR-1 three times — AS MATERIALIZED stops the
    // CTE chain from inlining into 3^rounds copies of the base scan
    val steps = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
  GROUP BY 1
), s$r AS (SELECT node FROM d$r WHERE deg >= $k),
e$r AS MATERIALIZED (
  SELECT a, b FROM e${r - 1}
  WHERE a IN (SELECT node FROM s$r) AND b IN (SELECT node FROM s$r)
)"""
    }.mkString(", ")
    s"""WITH $coOrderUndSql, e0 AS MATERIALIZED (SELECT a, b FROM und), $steps
SELECT node, deg AS core_degree FROM (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
  GROUP BY 1)
WHERE deg >= $k"""
  }

  /** The q_graph_lpa oracle: synchronous label propagation unrolled
    * round-for-round — per round a neighbor-label vote count, the
    * per-node max, and the min-label tie-break, exactly the operator's
    * three keyed aggregates. Each lR is referenced twice by round R+1,
    * so AS MATERIALIZED (the kCore discipline). */
  private def lpaOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { r =>
      s"""v$r AS (
  SELECT ud.a, l.label, count(*) AS cnt
  FROM ud JOIN l${r - 1} l ON ud.b = l.node GROUP BY 1, 2
), m$r AS (SELECT a, max(cnt) AS mx FROM v$r GROUP BY 1),
l$r AS MATERIALIZED (
  SELECT v$r.a AS node, min(v$r.label) AS label
  FROM v$r JOIN m$r ON v$r.a = m$r.a AND v$r.cnt = m$r.mx GROUP BY 1
)"""
    }.mkString(", ")
    s"""WITH $coOrderUndSql, ud AS MATERIALIZED (
  SELECT a, b FROM und UNION ALL SELECT b, a FROM und
), l0 AS MATERIALIZED (
  SELECT DISTINCT a AS node, a AS label FROM ud
), $steps
SELECT node::BIGINT AS node, label::BIGINT AS label FROM l$iters"""
  }

  /** The q_text_gopher_rep oracle: the 13 Gopher repetition rules
    * replicated in DuckDB — per-n gram CTEs (counts by the gram STRING;
    * the engine counts by 64-bit hash, identical up to ~m²/2⁶⁵
    * collisions), line/paragraph segment counts, and the same
    * integer-exact char sums, double divisions, 1.0 caps, round-6
    * display values and UNROUNDED keep comparisons as the operator. */
  private def gopherRepOracleSql: String = {
    val tops = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dups = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
      8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    val gramCtes = (tops ++ dups).map(_._1).map { n =>
      s"""g$n AS (
  SELECT doc_id, array_to_string(w[i:i+${n - 1}], ' ') AS g
  FROM d, unnest(range(1, len(w) - ${n - 2})) AS t(i)
), s$n AS (
  SELECT doc_id, max(c * length(g))::DOUBLE AS topv,
    coalesce(sum(CASE WHEN c >= 2 THEN c * length(g) END), 0)::DOUBLE AS dupv
  FROM (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY 1, 2)
  GROUP BY 1
)"""
    }.mkString(", ")
    def segCtes(p: String, sep: String) =
      s"""${p}cnt AS (
  SELECT doc_id, seg, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, $sep)) AS seg FROM d)
  GROUP BY 1, 2
), ${p}stat AS (
  SELECT doc_id,
    1.0 - count(*)::DOUBLE / sum(c) AS dup_frac,
    CASE WHEN sum(c * length(seg)) > 0
         THEN coalesce(sum(CASE WHEN c >= 2 THEN c * length(seg) END),
                0)::DOUBLE / sum(c * length(seg))
         ELSE 0.0 END AS dup_char
  FROM ${p}cnt GROUP BY 1
)"""
    def frac(v: String) =
      s"(CASE WHEN tc > 0 THEN least(coalesce($v, 0) / tc, 1.0) ELSE 0.0 END)"
    val gramCols = tops.map { case (n, _) =>
      s"round(${frac(s"s$n.topv")}, 6) AS top_${n}gram_char_frac" } ++
      dups.map { case (n, _) =>
        s"round(${frac(s"s$n.dupv")}, 6) AS dup_${n}gram_char_frac" }
    val keepTerms = Seq(
      "l.dup_frac <= 0.3", "p.dup_frac <= 0.3",
      "l.dup_char <= 0.2", "p.dup_char <= 0.2") ++
      tops.map { case (n, th) => s"${frac(s"s$n.topv")} <= $th" } ++
      dups.map { case (n, th) => s"${frac(s"s$n.dupv")} <= $th" }
    val joins = (tops ++ dups).map(_._1)
      .map(n => s"LEFT JOIN s$n USING (doc_id)").mkString(" ")
    s"""WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), tot AS (
  SELECT doc_id,
    (list_reduce([length(x) FOR x IN w], (a, b) -> a + b)
      + len(w) - 1)::DOUBLE AS tc
  FROM d
), ${segCtes("l", "chr(10)")}, ${segCtes("p", "chr(10) || chr(10)")},
$gramCtes
SELECT d.doc_id,
  round(l.dup_frac, 6) AS dup_line_frac,
  round(p.dup_frac, 6) AS dup_para_frac,
  round(l.dup_char, 6) AS dup_line_char_frac,
  round(p.dup_char, 6) AS dup_para_char_frac,
  ${gramCols.mkString(",\n  ")},
  (${keepTerms.mkString(" AND ")}) AS keep
FROM d
JOIN tot USING (doc_id)
JOIN lstat l USING (doc_id)
JOIN pstat p USING (doc_id)
$joins"""
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("q_fn_root")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extension
    * operators). Each takes (session, sf-dir) and returns the result. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- parity core: the config→single-select engine (SURVEY §2.1) ----

    // root-column functions: by-name builtin + closure, pass-through cols
    "q_fn_root" -> ((s, dir) => {
      new Functioniser()
        .add("c_name", "upper")
        .add("c_mktsegment", (c: Column) => lower(c))
        .apply(t(s, dir, "customer"))
    }),

    // new-root creation: constant + cross-field closure, appended sorted
    "q_fn_newroot" -> ((s, dir) => {
      new Functioniser()
        .add("greeting", lit("hello"))
        .add("full_label", (_: Column) =>
          concat(col("c_mktsegment"), lit("/"), col("c_name")))
        .apply(t(s, dir, "customer"))
    }),

    // composition on one path in add-order: substring(upper(x), 1, 5)
    "q_fn_compose" -> ((s, dir) => {
      new Functioniser()
        .add("p_type", "upper")
        .add("p_type", (c: Column) => substring(c, 1, 5))
        .apply(t(s, dir, "part"))
    }),

    // nested struct rewrite + nested-member creation, flattened back out
    "q_fn_nested" -> ((s, dir) => {
      val nested = t(s, dir, "orders").select(
        col("o_orderkey"),
        struct(col("o_orderstatus"), col("o_orderpriority")).as("info"))
      new Functioniser()
        .add("info.o_orderpriority", "upper")
        .add("info.prio_class", (_: Column) =>
          substring(col("info.o_orderpriority"), 1, 1))
        .apply(nested)
        .select(col("o_orderkey"),
          col("info.o_orderstatus").as("status"),
          col("info.o_orderpriority").as("priority"),
          col("info.prio_class").as("prio_class"))
    }),

    // array elementwise rewrite, exploded back to rows for comparison
    "q_fn_array" -> ((s, dir) => {
      val parts = t(s, dir, "part").select(
        col("p_partkey"), split(col("p_name"), " ").as("words"))
      new Functioniser()
        .add("words", "upper")
        .apply(parts)
        .select(col("p_partkey"), posexplode(col("words")).as(Seq("pos", "word")))
    }),

    // map-value rewrite ({} token): each map value doubled element-wise,
    // then exploded to rows so the driver can hash-compare (maps don't
    // survive the pandas comparator)
    "q_fn_map" -> ((s, dir) => {
      val df = t(s, dir, "documents").select(col("doc_id"),
        map(lit("chars"), col("n_chars"),
          lit("double_id"), col("doc_id")).as("m"))
      new Functioniser()
        .add("m{}", (c: Column) => c * 2)
        .apply(df)
        .select(col("doc_id"), explode(col("m")).as(Seq("k", "v")))
    }),

    // whole-struct + array-of-struct functions via PREFIX paths (SURVEY
    // §2.2-6): "info" resolves by prefix against the flattened leaves and
    // the function receives the struct Column; "tags" names an
    // array-of-structs and the function receives each ELEMENT. Flattened
    // back to scalars for the DuckDB hash-compare.
    "q_fn_struct" -> ((s, dir) => {
      val df = t(s, dir, "customer").select(
        col("c_custkey"),
        struct(col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
          .as("info"),
        array(struct(col("c_name").as("n")),
          struct(col("c_mktsegment").as("n"))).as("tags"))
      new Functioniser()
        .add("info", (c: Column) => struct(
          upper(c.getField("seg")).as("seg"),
          (c.getField("bal") * 2).as("bal")))
        .add("tags", (c: Column) =>
          struct(concat(c.getField("n"), lit("!")).as("n")))
        .apply(df)
        .select(col("c_custkey"),
          col("info.seg").as("seg"), col("info.bal").as("bal"),
          col("tags")(0)("n").as("tag0"), col("tags")(1)("n").as("tag1"))
    }),

    // the reference's hardest fixture shape (test_functioniser.py:171-184
    // "very nested array"): struct → array-of-struct → array-of-struct →
    // struct → array-of-struct → leaf, 6 path segments with add-order
    // composition (lower then trim) on the deep leaf
    "q_fn_deep" -> ((s, dir) => {
      val nested = t(s, dir, "orders").select(
        col("o_orderkey"),
        struct(
          col("o_orderstatus").as("has_pets"),
          array(struct(array(struct(struct(array(struct(
            concat(lit("   "), col("o_orderpriority"), lit("  "))
              .as("setup"))).as("array")).as("contrived"))).as("some")))
            .as("pet_details")).as("pets"))
      new Functioniser()
        .add("pets.pet_details.some.contrived.array.setup", "lower")
        .add("pets.pet_details.some.contrived.array.setup",
          (c: Column) => trim(c))
        .apply(nested)
        .select(col("o_orderkey"),
          col("pets.has_pets").as("has_pets"),
          col("pets.pet_details")(0)("some")(0)("contrived")("array")(0)
            ("setup").as("deep_value"))
    }),

    // ---- text analysis ----

    "q_text_stats" -> ((s, dir) =>
      TextAnalysis.annotate(t(s, dir, "documents"))
        .select("doc_id", "n_tokens", "type_token_ratio", "mean_token_len",
          "quality", "lang_pred", "fingerprint")),

    // Gopher-style rule gate (Rae 2021 App. A): word-count bounds,
    // mean-word-length bounds, symbol ratio, bullet/ellipsis line
    // fractions, alphabetic-word fraction, stopword floor.
    // minStopwords = 1 — the synthetic vocabulary carries English
    // stopwords sparsely (382/500 docs at sf0.01), so 1 discriminates
    // where the English-prose default of 2 would mostly gate on
    // vocabulary luck.
    "q_text_gopher" -> ((s, dir) =>
      TextAnalysis.gopherQualityFlags(t(s, dir, "documents"),
        minStopwords = 1)),

    // Gopher repetition rules (Rae 2021 App. A.2) — the companion gate
    // to q_text_gopher: duplicate line/paragraph (char) fractions plus
    // top 2-4-gram and dup 5-10-gram character fractions at the
    // published Table A1 thresholds. 13/500 sf0.01 docs trip the
    // top-2-gram rule; the corpus is single-line so the segment rules
    // measure an honest 0.
    "q_text_gopher_rep" -> ((s, dir) =>
      TextAnalysis.gopherRepetitionFlags(t(s, dir, "documents"))),

    // ensemble quality blend: min-max normalize TTR / mean word length
    // / stopword density against corpus-fit bounds (six doubles riding
    // as plan literals — no join, no window) and gate on the weighted
    // sum; keep decision on the unrounded blend
    "q_text_blend" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.blendQuality(docs, TextAnalysis.fitQualityStats(docs))
    }),

    // C4 line-level cleaning (Raffel 2020 §2.2): the corpus is a
    // single-line word stream, so the entry first derives a
    // deterministic page structure — 8-word lines, a line ends with '.'
    // iff (doc_id + line_idx) % 4 != 3 — replicated verbatim in the
    // oracle; the operator then keeps terminal-punctuation lines with
    // >= 3 words and gates pages on >= 4 surviving sentences
    // (150/500 sf0.01 pages fail)
    "q_text_c4" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = TextAnalysis.tokens(col("text"))
      val nLines = ceil(size(w).cast("double") / 8).cast("int")
      val structured = docs.select(col("doc_id"),
        concat_ws("\n", transform(sequence(lit(0), nLines - 1),
          i => concat(array_join(slice(w, i * 8 + 1, lit(8)), " "),
            when((col("doc_id") + i) % 4 =!= 3, lit("."))
              .otherwise(lit(""))))).as("text"))
      TextAnalysis.c4Clean(structured, minWordsPerLine = 3,
        minSentences = 4)
    }),

    // HTML -> main-content extraction (jusText-class): each doc is
    // wrapped in a deterministic page (head with script/style, a
    // link-dense nav, a short heading, the doc text as a paragraph, an
    // entity-bearing prose paragraph, a link-dense footer) — replicated
    // verbatim in the oracle; the operator strips markup, breaks blocks
    // to lines, decodes entities, and keeps lines on length >= 25,
    // link density <= 0.33, stopword fraction >= 0.01. The nav and
    // footer die on link density, the heading on length — only content
    // survives.
    "q_text_extract" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><head><title>t</title>" +
          "<script type=\"text/javascript\">var x = 1 < 2;</script>" +
          "<style>.nav a{color:#00c}</style></head><body>" +
          "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
          "<a href=\"/contact\">Contact</a></nav><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><!-- ad slot --><p>"),
        col("text"),
        lit("</p><p>This page is the &quot;fast&nbsp;&amp; " +
          "loose&quot; guide; it&#39;s about &lt;scale&gt;.</p>" +
          "<div class=\"footer\"><a href=\"/tos\">Terms of service</a>" +
          " | <a href=\"/privacy\">Privacy</a></div></body></html>"))
      graft.operators.HtmlExtract.extractText(
        docs.select(col("doc_id"), html.as("html")),
        minChars = 25, maxLinkDensity = 0.33, minStopFrac = 0.01)
    }),

    // hyperlink extraction: deterministic pages with root-relative,
    // dotted-relative, protocol-relative, absolute, and droppable
    // (fragment/mailto) links, resolved against a per-doc base URL
    "q_text_links" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href='/about/'>About&nbsp;Us</a></nav>" +
          "<p>see <a href=\"../sibling.html\">the <b>sibling</b></a> " +
          "and <a href=\"//cdn.example.net/lib.js\">cdn</a> and " +
          "<a href=\"https://other.example.org/x?id="),
        col("doc_id").cast("string"),
        lit("\">doc link</a> and <a href=\"#frag\">skip</a> " +
          "<a href=\"mailto:x@y\">skip too</a></p></body></html>"))
      val base = concat(lit("https://www.example.com/dir"),
        (col("doc_id") % 5).cast("string"), lit("/page/index.html"))
      graft.operators.HtmlExtract.extractLinks(
        docs.select(col("doc_id"), html.as("html"), base.as("base")),
        "doc_id", "html", baseUrlCol = Some("base"))
    }),

    // the crawl chain feeding the graph operators: extracted +
    // base-resolved links contract to the HOST graph (edge = src
    // host -> dst host with link and distinct-page counts) — the
    // page-level fan-in that PageRank/components consume at web
    // scale, where the host contraction is what makes the graph fit
    "q_graph_hostgraph" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href='/about/'>About&nbsp;Us</a></nav>" +
          "<p>see <a href=\"../sibling.html\">the <b>sibling</b></a> " +
          "and <a href=\"//cdn.example.net/lib.js\">cdn</a> and " +
          "<a href=\"https://other.example.org/x?id="),
        col("doc_id").cast("string"),
        lit("\">doc link</a> and <a href=\"#frag\">skip</a> " +
          "<a href=\"mailto:x@y\">skip too</a></p></body></html>"))
      val base = concat(lit("https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/dir"), (col("doc_id") % 5).cast("string"),
        lit("/page/index.html"))
      val links = graft.operators.HtmlExtract.extractLinks(
          docs.select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", baseUrlCol = Some("base"))
        .withColumn("src_url", concat(lit("https://site"),
          (col("doc_id") % 7).cast("string"),
          lit(".example.com/dir"), (col("doc_id") % 5).cast("string"),
          lit("/page/index.html")))
      graft.operators.Graph.hostGraph(links, "src_url", "href_abs",
        "doc_id")
    }),

    // one contraction level further: the registered-DOMAIN graph
    // (mirror subdomains pool under their eTLD+1) — the level
    // per-publisher caps and ranks operate at
    "q_graph_domaingraph" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href='/about/'>About&nbsp;Us</a></nav>" +
          "<p>see <a href=\"../sibling.html\">the <b>sibling</b></a> " +
          "and <a href=\"//cdn.example.net/lib.js\">cdn</a> and " +
          "<a href=\"https://other.example.org/x?id="),
        col("doc_id").cast("string"),
        lit("\">doc link</a> and <a href=\"#frag\">skip</a> " +
          "<a href=\"mailto:x@y\">skip too</a></p></body></html>"))
      val base = concat(lit("https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/dir"), (col("doc_id") % 5).cast("string"),
        lit("/page/index.html"))
      val links = graft.operators.HtmlExtract.extractLinks(
          docs.select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", baseUrlCol = Some("base"))
        .withColumn("src_url", base)
      graft.operators.Graph.hostGraph(links, "src_url", "href_abs",
        "doc_id", srcIsUrl = true, toDomain = true)
    }),

    // the same contraction under a FULL public-suffix list (the
    // PslDomain hash-walk expression): a private-domain entry keeps
    // each publisher label separate (example.com plays github.io's
    // role), a wildcard + exception pair governs example.org, and
    // unlisted hosts fall to the implicit-* default — the three PSL
    // rule kinds, each visible in the pooled edge set
    "q_graph_domaingraph_psl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href='/about/'>About&nbsp;Us</a></nav>" +
          "<p>see <a href=\"../sibling.html\">the <b>sibling</b></a> " +
          "and <a href=\"//cdn.example.net/lib.js\">cdn</a> and " +
          "<a href=\"https://other.example.org/x?id="),
        col("doc_id").cast("string"),
        lit("\">doc link</a> and <a href=\"#frag\">skip</a> " +
          "<a href=\"mailto:x@y\">skip too</a></p></body></html>"))
      val base = concat(lit("https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/dir"), (col("doc_id") % 5).cast("string"),
        lit("/page/index.html"))
      val links = graft.operators.HtmlExtract.extractLinks(
          docs.select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", baseUrlCol = Some("base"))
        .withColumn("src_url", base)
      graft.operators.Graph.hostGraph(links, "src_url", "href_abs",
        "doc_id", srcIsUrl = true, toDomain = true,
        suffixRules = Some(org.apache.spark.sql.graftext.PslRules
          .parse(Seq("com", "net", "org",
            "example.com", // private-domain entry
            "*.example.org", "!other.example.org"))))
    }),

    // the full crawl-to-ranking chain: extracted links contract to
    // the host graph, then WEIGHTED PageRank spreads each host's
    // mass in proportion to its link counts — what uniform-per-
    // neighbor ranking gets wrong on a contracted graph
    "q_graph_pagerank_hosts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href='/about/'>About&nbsp;Us</a></nav>" +
          "<p>see <a href=\"../sibling.html\">the <b>sibling</b></a> " +
          "and <a href=\"//cdn.example.net/lib.js\">cdn</a> and " +
          "<a href=\"https://other.example.org/x?id="),
        col("doc_id").cast("string"),
        lit("\">doc link</a> and <a href=\"#frag\">skip</a> " +
          "<a href=\"mailto:x@y\">skip too</a></p></body></html>"))
      val base = concat(lit("https://site"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com/dir"), (col("doc_id") % 5).cast("string"),
        lit("/page/index.html"))
      val links = graft.operators.HtmlExtract.extractLinks(
          docs.select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", baseUrlCol = Some("base"))
        .withColumn("src_url", base)
      val hg = graft.operators.Graph.hostGraph(links, "src_url",
        "href_abs", "doc_id")
      graft.operators.Graph.pageRankWeighted(hg, "src_host",
        "dst_host", "n_links", iters = 3)
    }),

    // anchor-text aggregation over the extracted link graph: per
    // target, link count, distinct sources, dominant anchor with a
    // (count desc, anchor asc) deterministic cut
    "q_text_anchors" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val html = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href='/about/'>About&nbsp;Us</a></nav>" +
          "<p>see <a href=\"../sibling.html\">the <b>sibling</b></a> " +
          "and <a href=\"//cdn.example.net/lib.js\">cdn</a> and " +
          "<a href=\"https://other.example.org/x?id="),
        col("doc_id").cast("string"),
        lit("\">doc link</a> and <a href=\"#frag\">skip</a> " +
          "<a href=\"mailto:x@y\">skip too</a></p></body></html>"))
      val base = concat(lit("https://www.example.com/dir"),
        (col("doc_id") % 5).cast("string"), lit("/page/index.html"))
      graft.operators.HtmlExtract.anchorTexts(
        graft.operators.HtmlExtract.extractLinks(
          docs.select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", baseUrlCol = Some("base")))
    }),

    // robots.txt parse + frontier gate composed: per-host bodies
    // (megabot fully blocked; * gets Allow /public/archive/ over
    // Disallow /public/; odd hosts also block /tmp), five URL shapes
    // per doc — longest-prefix precedence, Allow tie-break, default
    // allow all replicated in the oracle
    "q_url_robots" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct().select(
        concat(col("source"), lit(".example.com")).as("host"),
        concat(
          lit("# rules\nUser-agent: megabot\nDisallow: /\n\n" +
            "User-agent: *\nAllow: /public/archive/\n" +
            "Disallow: /public/\n"),
          when(substring(col("source"), 4, 10).cast("int") % 2 === 1,
            lit("Disallow: /tmp\n")).otherwise(lit(""))).as("body"))
      val rules = graft.operators.Robots.parseRobots(robots, agent = "*")
      val urls = docs.select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com"),
          element_at(typedlit(Seq("/public/x", "/public/archive/y",
            "/tmp/z", "/ok", "")),
            (col("doc_id") % 5 + 1).cast("int"))).as("url"))
      graft.operators.Robots.robotsGate(urls, rules)
    }),

    // robots.txt Sitemap directives: group-independent line scan —
    // case-folded directive, comments stripped, empty values dropped;
    // the discovered URLs feed parseSitemaps after fetching
    "q_url_sitemaps" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct().select(
        concat(col("source"), lit(".example.com")).as("host"),
        concat(
          lit("# policy\nUser-agent: *\nDisallow: /tmp\n" +
            "Sitemap: https://"), col("source"),
          lit(".example.com/sitemap.xml\n# c\nsitemap:   https://"),
          col("source"),
          lit(".example.com/sitemap-news.xml\nSitemap:\n")).as("body"))
      graft.operators.Robots.sitemapDirectives(robots)
    }),

    // URL canonicalization: deterministic messy URLs (case-shifted
    // scheme/host, userinfo, www, default port, tracking params,
    // unsorted query, trailing slash, fragment; every 7th row
    // unparseable) -> canonical key + host + approximate eTLD+1
    "q_url_canon" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val url = when(col("doc_id") % 7 === 3,
          concat(lit("not a url "), col("doc_id").cast("string")))
        .otherwise(concat(
          lit("HTTPS://user:pw@WWW."), col("source"),
          lit(".Example.CO.UK:443/Path/"), col("doc_id").cast("string"),
          lit("/?utm_source=news&b=2&A=1&gclid=xyz&keep#frag")))
      graft.operators.UrlOps.canonicalizeUrls(
        docs.select(col("doc_id"), url.as("url")))
    }),

    // sitemap parsing: one synthetic sitemap file per doc (three <url>
    // entries exercising entity-escaped locs, CDATA, missing fields,
    // junk priority, case-folded changefreq); every 5th doc is a
    // <sitemapindex> file instead — both kinds parse in one pass
    "q_url_sitemap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val d = col("doc_id").cast("string")
      val h = concat(col("source"), lit(".example.com"))
      val base = concat(lit("https://"), h)
      val urlset = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc>"),
        base, lit("/p/"), d, lit("?a=1&amp;b=2</loc><lastmod>2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        lit("</lastmod><changefreq>WEEKLY</changefreq>" +
          "<priority>0.8</priority></url>" +
          "<url><loc> <![CDATA["),
        base, lit("/raw/"), d,
        lit("]]> </loc></url><url><loc>"),
        base, lit("/x/"), d,
        lit("</loc><priority>bogus</priority></url></urlset>"))
      val index = concat(
        lit("<?xml version=\"1.0\"?><sitemapindex><sitemap><loc>"),
        base, lit("/sitemap-"), d,
        lit("-1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>" +
          "<sitemap><loc>"),
        base, lit("/sitemap-"), d,
        lit("-2.xml</loc></sitemap></sitemapindex>"))
      val files = docs.select(h.as("host"),
        when(col("doc_id") % 5 === 0, index).otherwise(urlset).as("xml"),
        col("doc_id"))
      graft.operators.Sitemaps.parseSitemaps(files)
    }),

    // sitemap freshness hints -> recrawl schedule, composed over the
    // real parse: per doc one dated URL cycling through all 8
    // changefreq shapes (incl. never + an unknown value) and one
    // hint-less URL; "now" pinned to 2026-02-01T00:00:00Z so due
    // splits on the declared period
    "q_url_recrawl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val d = col("doc_id").cast("string")
      val h = concat(col("source"), lit(".example.com"))
      val base = concat(lit("https://"), h)
      val cf = element_at(typedlit(Seq("always", "hourly", "daily",
        "weekly", "monthly", "yearly", "never", "sometimes")),
        (col("doc_id") % 8 + 1).cast("int"))
      val xml = concat(
        lit("<urlset><url><loc>"), base, lit("/p/"), d,
        lit("</loc><lastmod>2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        lit("</lastmod><changefreq>"), cf,
        lit("</changefreq></url><url><loc>"), base, lit("/n/"), d,
        lit("</loc></url></urlset>"))
      graft.operators.Sitemaps.recrawlSchedule(
        graft.operators.Sitemaps.parseSitemaps(
          docs.select(h.as("host"), xml.as("xml"))),
        nowEpoch = 1769904000L)
    }),

    // polite frontier scheduling: per-host priority queue with a URL
    // tie-break, per-host crawl-delay (odd hosts declare 2s, the rest
    // default), and a 15-fetch round budget (WindowGroupLimit plans
    // the cap map-side)
    "q_crawl_frontier" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val host = concat(col("source"), lit(".example.com"))
      val urls = docs.select(host.as("host"),
        concat(lit("https://"), host, lit("/p/"),
          col("doc_id").cast("string")).as("url"),
        when(col("doc_id") % 4 =!= 0,
          (col("doc_id") % 10).cast("double") / lit(10.0))
          .as("priority"),
        when(substring(col("source"), 4, 10).cast("int") % 2 === 1,
          lit(2000L)).as("delay_ms"))
      graft.operators.Frontier.schedule(urls,
        priorityCol = Some("priority"), delayMsCol = Some("delay_ms"),
        defaultDelayMs = 1000L, maxPerHost = 15)
    }),

    // Unicode normalization + mojibake repair: deterministic noise is
    // planted around each doc (NFD combining-acute sequence, cp1252
    // mojibake quotes, a BEL control, NBSP, a zero-width space) and
    // the operator repairs/normalizes it back out. form = NFC so the
    // normalization step itself runs under DuckDB's nfc_normalize;
    // the NFKC-only mappings are spec-pinned instead.
    "q_text_normalize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val noisy = docs.select(col("doc_id"),
        concat(
          lit("caf\u0065\u0301 menu \u2014 "),
          col("text"),
          lit(" tail: \u00E2\u20AC\u2122quoted\u00E2\u20AC\u2122" +
            "\u0007\u00A0end\u200B")).as("text"))
      graft.operators.Normalize.normalizeText(noisy, form = "NFC")
    }),

    // rule-based sentence segmentation: a planted prefix exercises the
    // abbreviation guard (Dr., e.g., No.), chained decimals (v1.2.3),
    // multi-punct boundaries (... / ?! ) before each doc's own text;
    // the full protect->mark->split chain replicates in DuckDB
    "q_text_sentences" -> ((s, dir) =>
      graft.operators.Sentences.splitSentences(
        sentenceSeeded(t(s, dir, "documents")))),

    // Flesch / Flesch-Kincaid readability over the same seeded corpus:
    // whitespace words, rule-split sentences, vowel-group syllables,
    // integer-scale display rounding (SURVEY para 8.1 discipline)
    "q_text_readability" -> ((s, dir) =>
      graft.operators.Sentences.readabilityScores(
        sentenceSeeded(t(s, dir, "documents")))),

    // Unigram-LM tokenizer training (Kudo hard-EM variant): substring
    // seed + forced chars, 2 Viterbi-EM rounds with integer expected
    // counts, count-prune to 40 — the full train replicates in DuckDB
    // with the DP rounds unrolled (round-9 ln terms, pinned tie-break)
    "q_text_unigram" -> ((s, dir) =>
      TextAnalysis.trainUnigram(t(s, dir, "documents"), "text",
        seedTopN = 60, maxPieceLen = 4, keepN = 40, emRounds = 2,
        maxWordLen = 8)),

    // train -> Viterbi-encode composition on the 10% held-out slice,
    // against the trained table's round-9 log-probs
    "q_text_unigram_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.unigramTokenize(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        TextAnalysis.trainUnigram(docs, "text", seedTopN = 60,
          maxPieceLen = 4, keepN = 40, emRounds = 2, maxWordLen = 8),
        maxPieceLen = 4)
    }),

    // persisted unigram model: train -> writeUnigramModel (maxPieceLen
    // rides in meta — a model property, not a call-site choice) ->
    // load -> Viterbi-encode the held slice; q_text_unigram_encode's
    // oracle verbatim
    "q_text_unigram_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_unigram_model_" +
          runTag(dir)).getPath
      graft.operators.ModelStore.writeUnigramModel(
        TextAnalysis.trainUnigram(docs, "text", seedTopN = 60,
          maxPieceLen = 4, keepN = 40, emRounds = 2, maxWordLen = 8),
        store, maxPieceLen = 4)
      graft.operators.ModelStore.unigramTokenizeFromModel(
        docs.filter(col("doc_id") % 10 === 0), store, "doc_id", "text")
    }),

    // corpus vocabulary: top tokens by frequency with doc frequency —
    // the tokenizer-training / stopword-derivation precursor
    "q_text_vocab" -> ((s, dir) =>
      TextAnalysis.buildVocab(t(s, dir, "documents"), "text", topN = 20)),

    // vocabulary coverage curve at three budget cuts: the top-N token
    // mass fraction that picks a tokenizer vocab size — one count
    // pass, then heap-based top-cut sums (no global sort)
    "q_text_coverage" -> ((s, dir) =>
      TextAnalysis.coverageCurve(t(s, dir, "documents"), "text",
        cuts = Seq(10, 100, 1000))),

    // S-stemmed vocabulary (Harman 1991): plural surface forms fold
    // before ranking — three guarded suffix rules, byte-replicable
    "q_text_stem" -> ((s, dir) =>
      TextAnalysis.stemmedVocab(t(s, dir, "documents"), "text",
        topN = 20)),

    // Zipf drift tripwire: least-squares ln(tf) ~ ln(rank) over the
    // top-200 vocabulary head (slope near -1 = natural text)
    "q_text_zipf" -> ((s, dir) =>
      TextAnalysis.zipfFit(t(s, dir, "documents"), "text", topN = 200)),

    // WordPiece-family inventory: frequency-ranked substrings (<= 6
    // chars) of the corpus words, deterministic tie-break
    "q_text_pieces" -> ((s, dir) =>
      TextAnalysis.trainPieces(t(s, dir, "documents"), "text",
        topN = 200, maxPieceLen = 6)),

    // train -> greedy-encode composition: the inventory trains on the
    // full corpus, the 10% held-out slice tokenizes against it via the
    // compiled literal-inventory expression (zero shuffle); oracle
    // replays the greedy longest-match as a recursive CTE
    "q_text_pieces_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.piecesTokenize(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        TextAnalysis.trainPieces(docs, "text", topN = 200,
          maxPieceLen = 6),
        maxPieceLen = 6)
    }),

    // persisted piece inventory: train -> writePiecesModel -> load ->
    // greedy-encode; q_text_pieces_encode's oracle verbatim
    "q_text_pieces_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_pieces_model_" +
          runTag(dir)).getPath
      graft.operators.ModelStore.writePiecesModel(
        TextAnalysis.trainPieces(docs, "text", topN = 200,
          maxPieceLen = 6), store, maxPieceLen = 6)
      graft.operators.ModelStore.piecesTokenizeFromModel(
        docs.filter(col("doc_id") % 10 === 0), store, "doc_id", "text")
    }),

    // overlapping context-window chunking (maxTokens 40, overlap 8):
    // long docs become fixed-budget training windows in one zero-shuffle
    // projection; the short final window is kept
    "q_text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkByTokens(t(s, dir, "documents"),
        maxTokens = 40, overlap = 8)),

    // JSONL round-trip: write the corpus as line-delimited JSON (the
    // pipeline interchange format), read it back with an explicit
    // schema (inference would cost a full extra pass at scale), and
    // check content + types against the parquet original
    "q_source_jsonl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_jsonl_" + runTag(dir)).getPath
      graft.sources.Sources.writeJsonl(docs, path)
      graft.sources.Sources.readJsonl(s, path, docs.schema)
    }),

    // CSV round-trip on the same table (quoting handles embedded
    // delimiters; explicit-schema read, no inference pass)
    "q_source_csv" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_csv_" + runTag(dir)).getPath
      graft.sources.Sources.writeCsv(docs, path)
      graft.sources.Sources.readCsv(s, path, docs.schema)
    }),

    // ORC round-trip on the same table (columnar, self-describing
    // schema from the footers; zstd stripes carry min/max stats for
    // the same pushdown the parquet scan gets)
    "q_source_orc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_orc_" + runTag(dir)).getPath
      graft.sources.Sources.writeOrc(docs, path)
      graft.sources.Sources.readOrc(s, path)
    }),

    // Avro round-trip over EVENTS — the table with a timestamp column,
    // so the logical-type mapping (timestamp-micros) is under the
    // oracle, not just the spec; write through Spark's commit
    // protocol, read back through the registered splittable
    // container reader
    "q_source_avro" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_avro_" + runTag(dir)).getPath
      graft.sources.Sources.writeAvro(ev, path)
      graft.sources.Sources.readAvro(s, path)
    }),

    // the same round-trip as a PAIR OF CONFIGS (write job + read
    // chain) — q_source_avro's oracle verbatim
    "q_pipeline_avro" -> ((s, dir) => {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_avro_cfg_" + runTag(dir)).getPath
      graft.operators.Pipeline.runJobJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "select",
           |   "params": {"cols": ["event_id", "ts", "user_id",
           |                       "event_type", "value"]}},
           |  {"op": "write_avro", "params": {"path": "$path"}}
           |]""".stripMargin)
      graft.operators.Pipeline.runJson(s,
        s"""[{"op": "read_avro", "params": {"path": "$path"}}]""")
    }),

    // WARC container parse: each doc becomes a 2-record blob — a
    // response record carrying the text and a metadata record whose
    // payload EMBEDS a fake WARC header (only the Content-Length walk
    // recovers it; a sentinel split would shear it) — plus a truncated
    // garbage tail that must drop. Every planted field must come back
    // byte-for-byte; the oracle states the ground truth directly
    "q_source_warc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crlf = "\r\n"
      val uri = concat(lit("https://"), col("source"),
        lit(".example.com/p/"), col("doc_id").cast("string"))
      val date = concat(lit("2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        lit("T00:00:00Z"))
      val payload2 = concat(lit("note WARC/1.0" + crlf +
        "Content-Length: 3" + crlf + crlf + "xyz tail of "),
        col("doc_id").cast("string"))
      val rec1 = concat(
        lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
          "WARC-Target-URI: "), uri,
        lit(crlf + "WARC-Date: "), date,
        lit(crlf + "Content-Length: "),
        octet_length(col("text")).cast("string"),
        lit(crlf + crlf), col("text"))
      val rec2 = concat(
        lit("WARC/1.0" + crlf + "WARC-Type: metadata" + crlf +
          "Content-Length: "),
        octet_length(payload2).cast("string"),
        lit(crlf + crlf), payload2)
      val blob = concat(rec1, lit(crlf + crlf), rec2,
        lit(crlf + crlf + "WARC/1.0 truncated-garbage"))
      graft.sources.Warc.parseWarc(
        docs.select(col("doc_id"), blob.as("blob")))
    }),

    // REAL-corpus .warc.gz ingest, end-to-end: per doc, TWO gzip
    // members (the CommonCrawl per-record-member layout) — an HTTP
    // response whose body charset varies by doc_id % 3 (declared
    // utf-8 / declared iso-8859-1 / UNDECLARED cp1252-only bytes, so
    // the strict-trial chain must pick a different decoder for each)
    // and a non-HTTP metadata record — plus a non-gzip garbage tail
    // that must drop. Byte walk + gunzip + HTTP split + charset
    // decode all exercised; the oracle states the planted ground
    // truth directly
    "q_source_warc_gz" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val crlf = "\r\n"
      val v = col("doc_id") % 3
      // latin-1 variants strip to printable ASCII first: the fixture
      // must stay latin-1-encodable whatever text the generator ships
      val atext = regexp_replace(col("text"), "[^\\x20-\\x7e]", "")
      val bodyBin = when(v === 0,
          encode(concat(col("text"), lit(" café №7")), "UTF-8"))
        .otherwise(encode(concat(atext, lit(" café")), "ISO-8859-1"))
      val ctype = when(v === 0, lit("text/html; charset=utf-8"))
        .when(v === 1, lit("text/html; charset=iso-8859-1"))
        .otherwise(lit("text/html"))
      val httpPayload = concat(
        encode(concat(
          lit("HTTP/1.1 200 OK" + crlf + "Content-Type: "),
          ctype, lit(crlf + crlf)), "UTF-8"),
        bodyBin)
      val uri = concat(lit("https://"), col("source"),
        lit(".example.com/p/"), col("doc_id").cast("string"))
      val rec1 = concat(
        encode(concat(
          lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
            "WARC-Target-URI: "), uri,
          lit(crlf + "Content-Length: "),
          length(httpPayload).cast("string"),
          lit(crlf + crlf)), "UTF-8"),
        httpPayload)
      val meta = concat(lit("fetch-ms: "), col("doc_id").cast("string"))
      val rec2 = encode(concat(
        lit("WARC/1.0" + crlf + "WARC-Type: metadata" + crlf +
          "Content-Length: "),
        octet_length(meta).cast("string"),
        lit(crlf + crlf), meta), "UTF-8")
      val blob = concat(
        org.apache.spark.sql.graftext.GzipBytes(rec1),
        org.apache.spark.sql.graftext.GzipBytes(rec2),
        lit("trailing non-gzip garbage".getBytes("US-ASCII")))
      graft.sources.Warc.httpResponses(graft.sources.Warc.parseWarcGz(
          docs.select(col("doc_id"), blob.as("blob"))))
        .select(col("doc_id"), col("rec_id"), col("warc_type"),
          col("target_uri"), col("http_status"), col("content_type"),
          col("charset"), col("body"))
    }),

    // FILE-based .warc.gz ingest (readWarcGz): the 100 TB entry point
    // — one task per file, records STREAMING out of each archive with
    // per-task memory bounded by one member + one record. Fixture:
    // docs bucket into 4 archives (doc_id % 4), one resource record
    // per doc as its own gzip member, members concatenated in doc_id
    // order — so rec_id is the doc's rank within its bucket, which
    // the oracle restates with a window
    "q_source_warc_files" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_warcgz_" + runTag(dir))
      val uri = concat(lit("https://"), col("source"),
        lit(".example.com/p/"), col("doc_id").cast("string"))
      val body = concat(lit("doc:"), col("doc_id").cast("string"))
      val rec = concat(
        lit("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "),
        uri, lit("\r\nContent-Length: "),
        length(body).cast("string"), lit("\r\n\r\n"), body)
      val member = org.apache.spark.sql.graftext.GzipBytes(
        encode(rec, "UTF-8"))
      val blobs = docs
        .select((col("doc_id") % 4).cast("int").as("bucket"),
          struct(col("doc_id"), member.as("m")).as("dm"))
        .groupBy(col("bucket"))
        .agg(array_sort(collect_list(col("dm"))).as("ms"))
        .select(col("bucket"),
          aggregate(col("ms"), lit(Array.emptyByteArray),
            (acc, x) => concat(acc, x.getField("m"))).as("blob"))
        .collect() // 4 bounded fixture rows — scaffolding, not the op
      org.apache.hadoop.fs.FileUtil.fullyDelete(base)
      base.mkdirs()
      blobs.foreach { r =>
        val f = new java.io.FileOutputStream(
          new java.io.File(base, s"w${r.getInt(0)}.warc.gz"))
        f.write(r.getAs[Array[Byte]]("blob")); f.close()
      }
      // the registered file source: spark.read.format("warcgz") is
      // the composable entry (globs, dirs, catalog, and — streaming —
      // file discovery); parseRecordRows is readWarcGz's projection
      graft.sources.Warc.parseRecordRows(
          s.read.format("warcgz").load(base.getAbsolutePath))
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
          col("rec_id"), col("warc_type"), col("target_uri"),
          col("content_length"),
          decode(col("payload"), "UTF-8").as("payload"))
    }),

    // per-document keyword extraction: top tokens by tf-idf, df riding
    // the same token-keyed partitioning as the tf groupBy (bm25 trick)
    "q_text_keywords" -> ((s, dir) =>
      TextAnalysis.keywordsTfIdf(t(s, dir, "documents"), "text",
        "doc_id", topK = 3)),

    // corpus collocations: top adjacent pairs by PMI over a count >= 5
    // floor; unigram tables broadcast onto the surviving bigrams, the
    // global top-n via TakeOrderedAndProject (no global window)
    "q_text_pmi" -> ((s, dir) =>
      TextAnalysis.collocationsPmi(t(s, dir, "documents"), "text",
        minCount = 5, topN = 20)),

    // per-language top tokens via the Misra-Gries heavy-hitters
    // aggregate: the exchange carries one <= capacity-counter summary
    // per (partition, lang) instead of one row per distinct token —
    // vocabulary-independent shuffle. capacity 256 >= the corpus
    // vocabulary, so counts are exact, max_err = 0, and the result is
    // partition-order-independent (the oracle-able parameterization)
    "q_text_heavyhitters" -> ((s, dir) =>
      TextAnalysis.heavyHitterTokens(t(s, dir, "documents"), "text",
        groupCols = Seq("lang"), capacity = 256, topN = 10)),

    // per-language vocabulary size via the KMV distinct sketch: the
    // exchange carries <= k 8-byte hashes per group regardless of
    // vocabulary. k = 16 < the per-lang distinct count, so this runs in
    // the REAL sketch regime — and is still fully oracled, because the
    // KMV estimate is a pure function of the hashed-token SET (MD5-48bit,
    // the repo's externally-replicable hash), independent of
    // partitioning; DuckDB reproduces the k-th-smallest-hash estimator
    // bit-for-bit (unlike HLL, whose register layout no external engine
    // replicates)
    "q_text_distinct" -> ((s, dir) =>
      TextAnalysis.approxDistinctTokens(t(s, dir, "documents"), "text",
        groupCols = Seq("lang"), k = 16)),

    // BPE tokenizer training (Sennrich 2016) on top of the vocab
    // statistics: 6 pair-merge rounds, pair count weighted by word
    // frequency, deterministic (count desc, pair asc) tie-break — the
    // merge table is the artifact a tokenizer ships, and every round
    // replicates exactly in the unrolled DuckDB oracle
    "q_text_bpe" -> ((s, dir) =>
      TextAnalysis.trainBpe(t(s, dir, "documents"), "text",
        numMerges = 6)),

    // BPE tokenizer APPLICATION: train 6 merges on the full corpus
    // (6-row driver metadata, the broadcast-merge-table pattern), then
    // tokenize the held split into subwords — the train -> encode
    // composition a tokenizer actually ships. The encode itself is one
    // narrow projection (merges ride as literals inside compiled folds):
    // zero shuffles, scan-speed
    "q_text_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = TextAnalysis.trainBpe(docs, "text", numMerges = 6)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeTokenize(docs.filter(col("doc_id") % 10 === 0),
        merges, "text", "doc_id")
    }),

    // the PERSISTED-model inference path: train -> writeBpeModel ->
    // load -> encode. Same oracle as q_text_bpe_encode — the stored
    // tokenizer must be bit-identical to the in-session one (the
    // trained-Monday-gates-Tuesday contract); kind tag + row count
    // verified eagerly at load
    "q_text_bpe_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_bpe_model_" + runTag(dir)).getPath
      graft.operators.ModelStore.writeBpeModel(
        TextAnalysis.trainBpe(docs, "text", numMerges = 6), store)
      graft.operators.ModelStore.bpeTokenizeFromModel(
        docs.filter(col("doc_id") % 10 === 0), store, "text", "doc_id")
    }),

    // BYTE-level BPE (the GPT-2/Llama production tokenizer shape):
    // UTF-8 bytes remap through the GPT-2 byte<->unicode table before
    // the same merge loop, so every byte of any script is a base
    // symbol — no UNK path exists. Train 6 merges on the full corpus,
    // encode the held slice; the oracle replays the byte remap (hex
    // pairs -> the 256-slot alphabet literal) and the merge rounds
    "q_text_bpe_bytes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = TextAnalysis.trainBpeBytes(docs, "text", numMerges = 6)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeTokenizeBytes(
        docs.filter(col("doc_id") % 10 === 0), merges, "text", "doc_id")
    }),

    // end-to-end curation pipeline: the oracled operators COMPOSE —
    // exact dedup, then a repetition + length quality gate, then
    // deterministic split assignment, one oracle over the whole chain
    "q_pipeline_curate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val gated = Dedup.dropExactDuplicates(docs, "doc_id", "text")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .withColumn("dup2", TextAnalysis.dupNgramFraction(col("text"), 2))
        .filter(col("dup2") <= 0.05 && col("n_tokens") >= 30)
      Curation.splitByHash(gated,
          Seq("train" -> 90L, "val" -> 5L, "test" -> 5L), Seq("doc_id"))
        .select("doc_id", "lang", "source", "n_tokens", "split")
    }),

    // the SAME curation chain as q_pipeline_cfg below demonstrates,
    // expressed purely as a config file (Pipeline.fromJson over the
    // whitelisted operator registry — the reference's config-driven
    // identity at whole-operator granularity); identical oracle
    "q_pipeline_cfg" -> ((s, dir) => {
      val cfg =
        """[
          |  {"op": "drop_exact_duplicates",
          |   "params": {"id_col": "doc_id", "text_col": "text"}},
          |  {"op": "token_count",
          |   "params": {"text_col": "text", "out_col": "n_tokens"}},
          |  {"op": "dup_ngram_fraction",
          |   "params": {"text_col": "text", "n": 2, "out_col": "dup2"}},
          |  {"op": "filter",
          |   "params": {"condition": "dup2 <= 0.05 AND n_tokens >= 30"}},
          |  {"op": "split_by_hash",
          |   "params": {"weights": [["train", 90], ["val", 5],
          |                          ["test", 5]],
          |              "key_cols": ["doc_id"]}},
          |  {"op": "select",
          |   "params": {"cols": ["doc_id", "lang", "source",
          |                       "n_tokens", "split"]}}
          |]""".stripMargin
      graft.operators.Pipeline.fromJson(cfg)(t(s, dir, "documents"))
    }),

    // deterministic train/val/test assignment: pure-integer hash
    // bucketing, no float boundary for engines to disagree on
    "q_sample_split" -> ((s, dir) =>
      Curation.splitByHash(t(s, dir, "documents"),
          Seq("train" -> 90L, "val" -> 5L, "test" -> 5L),
          keyCols = Seq("doc_id"))
        .select("doc_id", "source", "split")),

    // leakage-safe split: near-dup clusters assign as a unit (one hash
    // per connected component), so no test doc has a train near-copy;
    // unclustered docs keep their q_sample_split assignment
    "q_sample_split_safe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.splitByCluster(docs, "doc_id",
          Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3,
            numHashes = 64, bands = 32, threshold = 0.5),
          Seq("train" -> 90L, "val" -> 5L, "test" -> 5L))
        .select("doc_id", "source", "split")
    }),

    // domain-mixture resampling: rebalance the corpus to target
    // proportions (the scarcest requested domain caps the total)
    "q_sample_mixture" -> ((s, dir) =>
      Curation.resampleToMixture(t(s, dir, "documents"), "source",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
          keyCols = Seq("doc_id"))
        .select("doc_id", "source", "lang")),

    // temperature-flattened mixture at alpha = 0.5: sqrt weights are
    // correctly rounded in every IEEE engine, so the whole derivation
    // (counts -> weights -> floor keeps -> ranked prefix) oracles
    // exactly; a general pow could differ in the last ulp
    // (the raw corpus is source-uniform — flattening it is the identity
    // — so the entry induces skew first: all of src0, a third elsewhere)
    "q_sample_temperature" -> ((s, dir) =>
      Curation.resampleByTemperature(
          t(s, dir, "documents")
            .filter(col("source") === "src0" || col("doc_id") % 3 === 0),
          "source", alpha = 0.5, keyCols = Seq("doc_id"))
        .select("doc_id", "source", "lang")),

    // intra-document repetition: duplicated n-gram fractions, the
    // template-spam / degenerate-repetition quality gate
    "q_text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionScores(t(s, dir, "documents"), "doc_id")),

    // line-level code detection (the prose-vs-code router): the
    // fixture injects an indented line (%3), a brace-terminated
    // statement (%4) and a keyword line (%5) so every rule and their
    // combinations are exercised against the prose base line
    "q_text_code" -> ((s, dir) =>
      TextAnalysis.codeLineStats(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              lit("\n    indented continuation line")).otherwise(lit("")),
            when(col("doc_id") % 4 === 0,
              lit("\nif (x) { y(); }")).otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              lit("\nreturn value")).otherwise(lit("")))))
        .select("doc_id", "n_lines", "code_lines", "code_frac",
          "is_codey")),

    // winnowing fingerprints: any shared (w+k-1)-word run between two
    // docs shares a fingerprint, at ~2/(w+1) the density of shingles
    "q_text_winnow" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        explode(TextAnalysis.winnowedFingerprints(col("text"), 3, 4))
          .as("fingerprint"))),

    // MOSS-style overlap pairs over the winnow sketch: copied/templated
    // runs found sub-quadratically (fingerprint inverted index; any
    // shared (w+k-1)-word run guarantees a hit). maxDf = 100 engages the
    // boilerplate cap: a corpus-common fingerprint would otherwise form
    // one quadratic posting bucket — the df filter bounds every bucket
    // at 100²/2 join rows regardless of corpus size (mirrored in the
    // oracle's keep CTE)
    "q_text_overlap" -> ((s, dir) =>
      TextAnalysis.winnowOverlapPairs(t(s, dir, "documents"), "doc_id",
        "text", k = 3, w = 4, minShared = 2, maxDf = 100)),

    "q_text_fingerprints" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.subwordTokenCount(col("text")).as("n_subwords"),
        TextAnalysis.rollingFingerprint(col("text")).as("roll_hash"))),

    // ---- dedup family ----

    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")),

    // blocked edit-distance entity resolution over the DISTINCT name
    // inventory (representative id = min part key per name): pairs
    // within Levenshtein 3 that share the head-noun block; the block
    // cap is structural so no degenerate key forms a quadratic bucket
    "q_dedup_fuzzy" -> ((s, dir) => {
      val names = t(s, dir, "part").groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("name_id"))
      Dedup.editDistancePairs(names, "name_id", "p_name", maxDist = 3)
    }),

    // same blocking, length-normalized scorer: the native jaro_winkler
    // expression (DuckDB-pinned parameterization), threshold on the
    // round-6 score both sides
    "q_dedup_fuzzy_jw" -> ((s, dir) => {
      val names = t(s, dir, "part").groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("name_id"))
      Dedup.jaroWinklerPairs(names, "name_id", "p_name",
        threshold = 0.85)
    }),

    // passage-level (repeated-span) exact dedup: windows of 10 words,
    // first corpus occurrence kept, documents reassembled
    "q_dedup_passages" -> ((s, dir) =>
      Dedup.dedupPassages(t(s, dir, "documents"), "doc_id", "text",
        windowWords = 10)),

    // exact substring dedup at token granularity (Lee 2021): ANY
    // repeated >= 10-token run is removed from all but its corpus-first
    // occurrence — stride-1 shingles + merged-span removal, so partial
    // overlaps a fixed-window chunking misses are caught
    "q_dedup_spans" -> ((s, dir) =>
      Dedup.dedupTokenSpans(t(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // boilerplate (line-frequency) filter: a 10-word passage present in
    // >= 3 distinct documents is template, not content — dropped from
    // ALL of them (dedupPassages spares the first occurrence; this
    // spares none)
    "q_text_boilerplate" -> ((s, dir) =>
      Dedup.removeBoilerplate(t(s, dir, "documents"), "doc_id", "text",
        windowWords = 10, minDocs = 3)),

    // cross-source contamination matrix: distinct 3-gram shingles per
    // source, boilerplate cap at 10 sources (engaged: 20 sources share
    // the synthetic vocabulary), pairwise common counts + jaccard
    "q_dedup_sources" -> ((s, dir) =>
      Dedup.sourceOverlapMatrix(t(s, dir, "documents"),
        n = 3, maxGroups = 10)),

    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5)),

    // exact weighted-cosine all-pairs (Bayardo APSS): tf-idf vectors,
    // lossless L2 suffix-norm prefix filter, decimal-summed scores
    // exact idf-weighted cosine all-pairs search in the SPARSE shingle
    // space (n=3: term df is ~1 by construction, so posting lists —
    // and therefore candidates — track true pairs; the unigram dense
    // regime is the spec-pinned stressor for the prefix + L2 filters)
    "q_dedup_cosine" -> ((s, dir) =>
      Dedup.tfidfCosinePairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.7, n = 3)),

    // asymmetric containment |A∩B|/|A| >= 0.6: excerpt/subset detection
    // that symmetric Jaccard structurally misses for large containers
    "q_dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.6)),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5)),

    // incremental ingest: dedup an arriving batch (doc_id % 5 == 0)
    // against the already-stored corpus (the rest) — cross-side pairs
    // only, never corpus x corpus
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minHashLshPairsAgainst(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", n = 3, numHashes = 64, bands = 32,
        threshold = 0.5)
    }),

    // the persisted-signature-store form of the incremental join
    // (build → persist → probe inside the entry, the q_sim_ivf_indexed
    // pattern): the corpus signatures are written once and the batch
    // joins the STORE — output must equal the in-memory incremental
    // operator, hence the same oracle
    "q_dedup_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_sigstore_" + runTag(dir)).getPath
      Dedup.writeBandSignatures(docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", store, n = 3, numHashes = 64, bands = 32)
      Dedup.minHashLshPairsAgainstStore(
        docs.filter(col("doc_id") % 5 === 0), store, "doc_id", "text",
        threshold = 0.5)
    }),

    "q_dedup_simhash" -> ((s, dir) =>
      // hammingMax=15 with 16 chunks sits exactly at the pigeonhole
      // recall guarantee (≤ chunks-1 flipped bits always share a chunk)
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, hammingMax = 15, chunks = 16, threshold = 0.5)),

    "q_dedup_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // the cleaning pipeline uses the sub-quadratic MinHash pair table;
      // its exact-verification stage makes the output identical to the
      // exhaustive-Jaccard oracle (recall pinned by spec + this gate)
      Dedup.dropNearDuplicates(docs, "doc_id",
          Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3,
            numHashes = 64, bands = 32, threshold = 0.5))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // transitive near-dup clusters (distributed min-label propagation)
    // over the sub-quadratic MinHash pair table; oracled by a DuckDB
    // recursive-CTE connected-components over the same pair set
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.nearDupClusters(
        Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3,
          numHashes = 64, bands = 32, threshold = 0.5))
    }),

    // quality-aware resolution: every duplicate cluster keeps its
    // LONGEST member (n_chars priority, ties to the smaller id) — the
    // production keep-the-best policy, vs q_dedup_clean's keep-first
    "q_dedup_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.keepBestOfClusters(docs, "doc_id",
          Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3,
            numHashes = 64, bands = 32, threshold = 0.5),
          "n_chars")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // the sub-quadratic-shaped scale path (banded hyperplane LSH + exact
    // cosine verify) is the oracled entry; the O(n²) exact form
    // (Dedup.embeddingNearDupPairs) is demoted to spec-side oracle duty.
    // Recall vs exact is 1.0 on this corpus at the default 64×5 banding
    // (measured; see Similarity.lshNearDupPairs header for the math)
    "q_dedup_embedding" -> ((s, dir) =>
      Similarity.lshNearDupPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.45)),

    // the REALISTIC-regime operating point (t = 0.8) — the headline
    // embedding-dedup bench entry. This corpus's background cosines top
    // out ≈ 0.6, so near-dup pairs are PLANTED (as q_text_scrub plants
    // PII): every 20th vector gets a companion mixed with 0.2×reverse(v),
    // cosine ≈ 0.98 to its source. At t = 0.8 a small 12×8 banding keeps
    // buckets tiny (candidates ∝ true pairs, ~25× below all-pairs —
    // measured; the sub-linear scale path) with per-pair miss ≈ 2e-5;
    // t = 0.45 above remains the adversarial recall stressor.
    "q_dedup_embedding_t08" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val aug = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          zip_with(col("e"), reverse(col("e")),
            (x, y) => x + lit(0.2) * y).as("e"))
      Similarity.lshNearDupPairs(emb.union(aug), "vec_id", "e",
        threshold = 0.8, numPlanes = 8, tables = 12)
    }),

    // semantic benchmark decontamination: corpus documents whose
    // embeddings sit too close to a benchmark embedding (cross-side
    // banded LSH + exact verify — corpus never pairs with itself). The
    // benchmark is every 20th vector; its planted companion (the t08
    // construction, cosine ≈ 0.98) lives in the corpus and must be
    // flagged.
    "q_sim_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val bench = emb.filter(col("vec_id") % 20 === 0)
      val corpus = emb.filter(col("vec_id") % 20 =!= 0)
        .union(bench.select((col("vec_id") + 100000).as("vec_id"),
          zip_with(col("e"), reverse(col("e")),
            (x, y) => x + lit(0.2) * y).as("e")))
      Similarity.lshNearDupPairsAgainst(bench, corpus, "vec_id", "e",
        threshold = 0.8, numPlanes = 8, tables = 12)
    }),

    // PQ ANN: 8 subspaces x 16 codes = 8 bytes/vector corpus storage,
    // ADC-scored; lloydIters = 0 makes train->encode->score->rank
    // exactly replicable by the oracle
    "q_sim_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, m = 8, ksub = 16, lloydIters = 0)
    }),

    // SemDeDup: k-means cells bound the pairwise sweep; lloydIters = 0
    // keeps the deterministic lowest-id centroid init, so the cell
    // layout (and thus the kept set) is exactly reproducible in the
    // DuckDB oracle. Same planted-companion corpus as t08 above, so the
    // sweep has real near-dups (cos ≈ 0.98) to drop at t = 0.8.
    "q_dedup_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val aug = emb.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          zip_with(col("e"), reverse(col("e")),
            (x, y) => x + lit(0.2) * y).as("e"))
      Similarity.semDedup(emb.union(aug), "vec_id", "e",
        threshold = 0.8, nlist = 8, lloydIters = 0)
    }),

    // ---- similarity search ----

    // per-label centroids: mean-pool + unit-normalize — the standard
    // reduction for domain profiles / cluster summaries / k-NN
    // prototypes; decimal summation makes the means bit-stable.
    // The centroid array is exploded to (pos, value) rows for the
    // harness: the driver's pandas sort-then-hash comparator cannot
    // hash array cells (the q_fn_map / q_multimodal_frames precedent).
    "q_sim_centroids" -> ((s, dir) =>
      Similarity.meanPoolByKey(t(s, dir, "embeddings"), "label",
        "embedding", normalize = true)
        .select(col("key"), col("n_vectors"),
          posexplode(col("centroid")).as(Seq("pos", "value")))),

    // distance-to-centroid outlier flags: vectors whose cosine distance
    // to their k-means cell centroid is an extreme z-score within the
    // cell — the embedding-corpus QA pass. This synthetic corpus is
    // near-isotropic (within-cell distances concentrate around ~0.75
    // with max natural z ≈ 1.4, and cosine ignores norm, so no plantable
    // vector lands far from EVERY centroid), so the gate runs at the
    // empirical tail (zMax = 1) and flags the corpus's most atypical
    // vectors; the 2σ default stays spec-pinned on a planted cluster.
    // lloydIters = 0 keeps the deterministic lowest-id init so the
    // oracle replicates the cell layout exactly.
    "q_sim_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(t(s, dir, "embeddings"), "vec_id",
        "embedding", nlist = 16, zMax = 1.0, lloydIters = 0)),

    // k-means corpus clustering (topic/layout partitioning):
    // lloydIters = 0 keeps the deterministic lowest-id init so the
    // oracle replicates the full assignment
    "q_sim_cluster" -> ((s, dir) =>
      Similarity.kmeansAssign(t(s, dir, "embeddings"), "vec_id",
        "embedding", nlist = 16, lloydIters = 0)),

    "q_sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // hard-negative mining: for each anchor the closest OTHER-label
    // vectors — contrastive training pairs; label inequality rides in
    // the broadcast join predicate, same top-k shape as q_sim_topk
    "q_sim_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", k = 5)
    }),

    // MMR diversified re-ranking (Carbonell & Goldstein 1998) of the
    // exact top-20 candidates: 5 greedy picks per query at λ=0.7 —
    // each round is one window over the bounded per-query candidate
    // group plus a broadcast join of the single picked row per query
    "q_sim_mmr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.mmrRerank(
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 20),
        emb, "vec_id", "embedding", k = 5)
    }),

    // ANN paths: q_sim_ann is FULLY oracled (the deterministic seed-42
    // planes interpolate into the SQL as literals); q_sim_ivf oracles
    // the deterministic lowest-id init at the real nprobe=4 probe, and
    // q_sim_ivf_lloyd oracles REFINED training too (the integer-lattice
    // Lloyd mean is order-independent, so one training round replicates
    // exactly in DuckDB SQL).
    // JL dimensionality reduction 64→16 before indexing: literal
    // Gaussian matrix compiled into the projection, scan-speed, no
    // join/broadcast; exploded to scalar rows for the comparator
    "q_sim_reduce" -> ((s, dir) =>
      Similarity.reduceDims(t(s, dir, "embeddings"), "vec_id",
          "embedding", k = 16)
        .select(col("id").as("vec_id"),
          posexplode(col("reduced")).as(Seq("pos", "value")))),

    "q_sim_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, numPlanes = 6)
    }),

    "q_sim_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // lloydIters = 0 keeps the deterministic lowest-id cell init so
      // the PARTIAL probe (nprobe = 4 of 16 — the real ANN regime, not
      // the degenerate full probe) runs under a full DuckDB oracle;
      // Lloyd-refined training stays recall-spec'd in OperatorsSpec
      // (its float aggregation order is not externally replicable)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4,
        lloydIters = 0)
    }),

    // Lloyd-REFINED partial-probe IVF under a full DuckDB oracle: the
    // refinement mean is integer-lattice-summed (round(v*1e9) long
    // lattice points, exact order-independent hi/lo long addition, one
    // double division), so one training round replicates
    // bit-exactly in SQL. Removes the last "not externally replicable"
    // carve-out: training, assignment, partial probe, and re-rank all
    // run under the oracle together.
    "q_sim_ivf_lloyd" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4,
        lloydIters = 1)
    }),

    // zero hyperplanes ⇒ one shared bucket ⇒ the LSH pipeline provably
    // equals exact search, so the full machinery (hashing, probing,
    // bucket join, rank) runs under the brute-force oracle
    "q_sim_ann_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, numPlanes = 0)
    }),

    // recall@5 of the multi-probe LSH search against exact truth —
    // the acceptance metric for every approximate path; per-query +
    // decimal-summed macro average
    "q_sim_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.recallAtK(
        Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          k = 5, numPlanes = 6),
        Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          k = 5, numPlanes = 0))
    }),

    // IVF with nprobe = nlist provably equals exact search (every cell is
    // probed), so the full IVF machinery — Lloyd training, cell
    // assignment, probe ranking, per-cell scoring — runs under the
    // brute-force DuckDB oracle
    "q_sim_ivf_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 16,
        lloydIters = 1)
    }),

    // the PERSISTED IVF index — the 100 TB similarity form: train, write
    // the corpus cell-partitioned, then answer the query batch off the
    // index with file-level partition pruning (PartitionFilters asserted
    // in ScaleOpsSpec). nprobe = nlist probes every cell, which provably
    // equals exact search, so build→persist→prune→score runs end-to-end
    // under the same brute-force DuckDB oracle as q_sim_ivf_exact.
    "q_sim_ivf_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivf_index_" + runTag(dir)).getPath
      val centroids = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
        idx, nlist = 16, lloydIters = 1)
      Similarity.ivfTopKIndexed(idx, centroids,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 16)
    }),

    // the persisted IVF-PQ index — coarse cells prune at the file level
    // (like q_sim_ivf_indexed) and the payload is 8 codebook indices per
    // vector (like q_sim_pq). nprobe = nlist probes every cell, which
    // provably equals pqTopK at the same codebooks, so
    // build→persist→prune→ADC-score runs end-to-end under the q_sim_pq
    // DuckDB oracle.
    "q_sim_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivfpq_index_" + runTag(dir)).getPath
      val (centroids, codebooks) = Similarity.buildIvfPqIndex(
        emb, "vec_id", "embedding", idx,
        nlist = 16, m = 8, ksub = 16, lloydIters = 1, pqLloydIters = 0)
      Similarity.ivfTopKIndexedPq(idx, centroids, codebooks,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 16)
    }),

    // residual-encoded IVF-PQ under a full DuckDB oracle: lloydIters = 0
    // makes the coarse cells deterministic (lowest-id init, the
    // q_sim_outliers precedent), so the oracle can replicate cell
    // assignment → residuals → residual-codebook init → per-subspace
    // argmax encode → shifted ADC scoring exactly. Full probe scores
    // every coded row, but UNLIKE raw mode the scores depend on each
    // row's cell centroid — which is why the oracle replicates the
    // cells rather than falling back to the pqTopK equivalence.
    "q_sim_ivfpq_residual" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivfpq_res_index_" + runTag(dir))
        .getPath
      val (centroids, codebooks) = Similarity.buildIvfPqIndex(
        emb, "vec_id", "embedding", idx,
        nlist = 16, m = 8, ksub = 16, lloydIters = 0, pqLloydIters = 0,
        residuals = true)
      Similarity.ivfTopKIndexedPq(idx, centroids, codebooks,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 16, residuals = true)
    }),

    // ---- events: windowed aggregation + sessionization ----

    "q_events_window" -> ((s, dir) =>
      Events.windowedStats(t(s, dir, "events"))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("n_events"),
          col("sum_value"))),

    "q_events_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"), gapSeconds = 1800)),

    // as-of join: each purchase matched to the user's latest prior click
    "q_events_asof" -> ((s, dir) => {
      val events = t(s, dir, "events")
      AsOfJoin.asOfJoin(
          events.filter(col("event_type") === "purchase"),
          events.filter(col("event_type") === "click")
            .withColumnRenamed("event_id", "click_id"),
          keyCol = "user_id", tsCol = "ts",
          leftCols = Seq("event_id"), rightCols = Seq("click_id"))
        .select(col("user_id"), col("event_id"), col("click_id"))
    }),

    // anchored funnel: view → click → purchase within a day of each
    // user's first view; one narrow filtered stage per step
    "q_events_funnel" -> ((s, dir) =>
      Events.funnel(t(s, dir, "events"),
        steps = Seq("view", "click", "purchase"), windowSeconds = 86400)),

    // daily cohort retention: users bucketed by first-active day,
    // counted in each later day they act — integer period indices, one
    // distinct + user/cohort-keyed aggregates, no window
    "q_events_retention" -> ((s, dir) =>
      Events.retentionCohorts(t(s, dir, "events"),
        periodSeconds = 86400L)),

    // time-series gap-fill: resample each user's stream onto a 6-hour
    // grid (last event per bucket is the representative), then
    // forward-fill and linearly interpolate the holes — per-user
    // sequence explode + two frame-bounded user-keyed windows, no
    // global range
    "q_events_gapfill" -> ((s, dir) =>
      Events.gapFill(t(s, dir, "events"), periodSeconds = 21600L)
        .select(col("user_id"), col("period"), col("observed"),
          col("v_ffill"), col("v_interp"))),

    // rolling z-score anomalies: events > 3 sigma from the mean of the
    // user's previous 20 events (min 8 priors) — DECIMAL-exact window
    // sums, keep decision on the unrounded z
    "q_events_anomalies" -> ((s, dir) =>
      Events.rollingAnomalies(t(s, dir, "events"), nPrior = 20,
        minPrior = 8, zThreshold = 3.0)),

    // seasonal-baseline anomalies: each event scored against its
    // (type, hour-of-day) cell mean/sd — the periodic complement to
    // the trailing z-score; decimal-exact cell moments, broadcast
    // cell join, flag on the unrounded doubles
    "q_events_seasonal" -> ((s, dir) =>
      Events.seasonalBaseline(t(s, dir, "events"), k = 3.0,
        minObs = 30L)),

    // per-user inter-arrival stats + Goh-Barabasi burstiness: whole-
    // second gaps, decimal-exact moments, one fixed-shape B formula —
    // the bot/scheduler fingerprint
    "q_events_burstiness" -> ((s, dir) =>
      Events.interArrivalStats(t(s, dir, "events"))),

    // range (interval) join via time-bin bucketing: every click within
    // the hour BEFORE each purchase; pairs meet in exactly one bin so no
    // dedup stage, and hot time ranges spread across (key, bin) buckets
    "q_events_range" -> ((s, dir) => {
      val events = t(s, dir, "events")
      RangeJoin.rangeJoin(
          events.filter(col("event_type") === "purchase"),
          events.filter(col("event_type") === "click")
            .withColumnRenamed("event_id", "click_id"),
          keyCol = "user_id", tsCol = "ts",
          lowerSeconds = 3600, upperSeconds = 0,
          leftCols = Seq("event_id"), rightCols = Seq("click_id"))
        .select(col("user_id"), col("event_id"), col("click_id"))
    }),

    // corpus composition rollup (the first report any training-data
    // pipeline runs): per-language doc counts, volume, exact median via
    // interpolated percentile, token totals. Exact percentile buffers a
    // group's values (ObjectHashAggregate) — right for oracle-ability
    // here; at 100 TB swap percentile → approx_percentile (t-digest,
    // bounded state) for the same plan shape
    "q_text_corpus" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(expr("percentile(n_chars, 0.5D)"), 6).as("median_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))),

    // multi-dimensional rollup (grouping sets): per-(lang, source),
    // per-lang, and grand-total stats in ONE pass — Spark expands the
    // grouping sets inside a single hash aggregate (one shuffle), vs
    // three scans + a union by hand. Integer aggregates only, so the
    // rollup is hash-stable by construction.
    "q_text_rollup" -> ((s, dir) =>
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(size(split(col("text"), " ")).cast("long"))
            .as("total_tokens"))),

    // ---- dataset curation: reproducible sampling + sequence packing ----

    // exact-fraction stratified sample: every language represented at
    // exactly ⌈0.2·n⌉ docs, ranked by content hash (deterministic)
    "q_sample_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(t(s, dir, "documents"), Seq("lang"),
          fraction = 0.2, keyCols = Seq("doc_id"))
        .select("doc_id", "lang", "source")),

    // shuffle-free hash-threshold sample — the pure-scan 100 TB form;
    // nested (a higher fraction is a superset), retry-stable
    "q_sample_hash" -> ((s, dir) =>
      Curation.sampleByHashThreshold(t(s, dir, "documents"),
          fraction = 0.3, keyCols = Seq("doc_id"))
        .select("doc_id", "lang")),

    // weighted deterministic sample: acceptance probability = per-row
    // quality proxy (n_chars/400, capped at 1) — longer docs always
    // survive, shorter ones at a downweighted rate, reproducibly
    "q_sample_weighted" -> ((s, dir) =>
      Curation.sampleByWeightedHash(t(s, dir, "documents"),
          least(col("n_chars").cast("double") / 400.0, lit(1.0)),
          keyCols = Seq("doc_id"))
        .select("doc_id", "n_chars")),

    // soft dedup: every LSH near-dup cluster keeps expected mass 1 by
    // sampling members at weight 1/|cluster| — duplicate-mass
    // reweighting, not deletion; deterministic weighted-hash keep
    "q_sample_softdedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.softDedupSample(
          docs.select("doc_id", "lang", "source"),
          Dedup.nearDupClusters(
            Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3,
              numHashes = 64, bands = 32, threshold = 0.5)))
    }),

    // per-language length distribution via the mergeable GK quantile
    // sketch at the exact degenerate regime (eps = 0: partition-order
    // independent, externally replicable); the eps > 0 bounded-state
    // path and the persisted shard-merge layout are spec-pinned
    "q_stats_quantiles" -> ((s, dir) =>
      graft.operators.Stats.quantileStats(t(s, dir, "documents"),
        "n_chars", qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0),
        groupCols = Seq("lang"))),

    // damped PageRank over the supplier -> part edge graph (3
    // synchronous iterations): link-structure importance, one shuffle
    // per iteration, contributions round-9 + decimal-summed so every
    // iteration is partition-order independent and the unrolled oracle
    // replicates the ranks bit-for-bit. part keys offset so the two id
    // spaces can't collide into one node
    // classifier-threshold calibration: sweep 20 candidate thresholds
    // of a cheap n_chars gate against the true >=60-token label —
    // confusion counts + P/R/F1 per threshold, cumsum via bounded
    // self-join (no global window)
    "q_stats_prcurve" -> ((s, dir) =>
      graft.operators.Stats.prCurve(
        t(s, dir, "documents")
          .withColumn("is_long", size(split(col("text"), " ")) >= 60),
        "n_chars", "is_long", bins = 20)),

    // the one-number companion: binned ROC-AUC of the same gate via
    // the Mann-Whitney bin sums (no global sort or rank anywhere)
    "q_stats_auc" -> ((s, dir) =>
      graft.operators.Stats.aucBinned(
        t(s, dir, "documents")
          .withColumn("is_long", size(split(col("text"), " ")) >= 60),
        "n_chars", "is_long", bins = 20)),

    // two-sample KS drift between the click and purchase value
    // distributions, 5-unit bins: per-bin counts are the only
    // corpus-sized shuffles; the CDF compare is exact-integer
    // cross-products over the bounded bin frame
    "q_stats_ks" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.ksDrift(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "value", binWidth = 5.0)
    }),

    // robust outlier gate on event values: median/MAD thresholds are
    // two bounded aggregates rounded-6, the gate itself scan-speed
    "q_stats_mad" -> ((s, dir) =>
      graft.operators.Stats.madOutliers(
        t(s, dir, "events").select("event_id", "value"), "value",
        k = 3.5)),

    // categorical drift: KL(P_even ‖ P_odd) over the language mix of
    // the two doc_id parities — the label-space complement to the
    // continuous KS statistic
    "q_stats_kl" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Stats.klDivergence(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "lang")
    }),

    // feature-redundancy screen over the four lineitem measures: every
    // pairwise Pearson from ONE aggregate pass, decimal-summed moments
    "q_stats_corr" -> ((s, dir) =>
      // scale=2: the TPC-H measures carry exactly 2 decimals, so cent
      // quantization is lossless and |iv| stays far inside the 1e9
      // guard (prices reach 1e5; the scale=4 default would trip it)
      graft.operators.Stats.correlationMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2)),

    // chance-corrected agreement between consecutive event types per
    // user — repeat-behavior beyond what the type marginals predict
    "q_stats_kappa" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .select(col("event_type").as("cur"),
          lead(col("event_type"), 1).over(w).as("nxt"))
      graft.operators.Stats.cohenKappa(pairs, "cur", "nxt")
    }),

    // Deequ-style table-health profile: per-column completeness /
    // distinctness / min-max-mean from ONE aggregate pass (the
    // multi-distinct plans as Spark's Expand)
    "q_stats_profile" -> ((s, dir) =>
      graft.operators.Stats.profileColumns(t(s, dir, "customer"),
        Seq("c_custkey", "c_acctbal", "c_mktsegment"))),

    // Benford first-digit audit on the price column: string-form
    // first [1-9], all 9 digit rows, ln-shape expected fractions,
    // decimal-summed chi-square — the fabricated-data tripwire
    "q_stats_benford" -> ((s, dir) =>
      Stats.benfordTest(t(s, dir, "lineitem"), "l_extendedprice")),

    // key-concentration audit on the order->customer FK: Gini over
    // per-key counts (exact integer rank sums) + top-1%/10% shares —
    // the whale/skew detector; windows run on the key dictionary
    "q_stats_concentration" -> ((s, dir) =>
      Stats.keyConcentration(t(s, dir, "orders"), "o_custkey")),

    // winsorization at the [p05, p95] fences: round-6 thresholds (the
    // filterByQuantile discipline), scan-speed clip + observable rate
    "q_stats_winsorize" -> ((s, dir) =>
      Stats.winsorize(t(s, dir, "events"), "value",
        lo = 0.05, hi = 0.95)),

    // Welch's t-test between two event cohorts: the A/B readout for
    // data-recipe experiments — exact long-lattice moments (hi/lo
    // sum-of-squares halves), fixed double shapes for t and the
    // Welch-Satterthwaite df
    "q_stats_ttest" -> ((s, dir) =>
      Stats.welchTTest(t(s, dir, "events"), "value", "event_type",
        groupA = "click", groupB = "view")),

    // chi-square independence + Cramér's V between two categoricals
    // (event type × above-median flag): integer cells, closed-form
    // zero-cell mass, decimal-summed terms
    "q_stats_chi2" -> ((s, dir) =>
      Stats.chiSquareIndependence(
        t(s, dir, "events").withColumn("hit", col("value") > 50.0),
        "event_type", "hit")),

    // two-proportion z-test: the conversion-rate A/B (success =
    // above-median event value) — exact integer counts, fixed double
    // shape for the pooled z
    "q_stats_ztest" -> ((s, dir) =>
      Stats.proportionZTest(
        t(s, dir, "events").withColumn("hit", col("value") > 50.0),
        "hit", "event_type", groupA = "click", groupB = "purchase")),

    // k-anonymity audit: quasi-identifier combinations (nation ×
    // segment × account-balance band) held by fewer than k customers
    // — output ∝ violations, one hash aggregate. The band is
    // floor(x/1000): generalization upstream is what makes the
    // audit meaningful
    "q_stats_kanon" -> ((s, dir) =>
      Stats.kAnonymityViolations(
        t(s, dir, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 1000.0).cast("int")),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)),

    // the matching release gate: suppress rows whose combination is
    // below k (aggregate + null-safe semi join back; the combo frame
    // broadcasts). Emits the surviving keys + their combination.
    "q_stats_kanon_suppress" -> ((s, dir) =>
      Stats.suppressBelowK(
        t(s, dir, "customer").withColumn("bal_band",
          floor(col("c_acctbal") / 1000.0).cast("int")),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5)
        .select("c_custkey", "c_nationkey", "c_mktsegment",
          "bal_band")),

    // referential-integrity audit over the star schema: dangling FK
    // keys per relationship — dictionary-vs-dictionary anti-joins
    // (distinct-with-counts child side), one summary row each
    "q_stats_integrity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      Seq(
        Stats.referentialOrphans(li, ord, "l_orderkey", "o_orderkey",
          "lineitem.l_orderkey->orders.o_orderkey"),
        Stats.referentialOrphans(ord, cust, "o_custkey", "c_custkey",
          "orders.o_custkey->customer.c_custkey"),
        Stats.referentialOrphans(li, t(s, dir, "part"), "l_partkey",
          "p_partkey", "lineitem.l_partkey->part.p_partkey"),
        Stats.referentialOrphans(t(s, dir, "events"), cust, "user_id",
          "c_custkey", "events.user_id->customer.c_custkey")
      ).reduce(_ union _)
    }),

    // incremental table health: per-status profile shards persist to
    // parquet, then merge WITHOUT rescanning orders — every metric is
    // exactly mergeable, so merged == direct (the quantile-shard
    // contract applied to the constraint profile)
    "q_stats_profile_shards" -> ((s, dir) => {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_profshards_" + runTag(dir)).getPath
      graft.operators.Stats.writeProfileShards(t(s, dir, "orders"), work,
        Seq("o_totalprice", "o_custkey"), Seq("o_orderstatus"))
      graft.operators.Stats.profileFromShards(s, work,
        Seq("o_totalprice", "o_custkey"))
    }),

    // approximate distinct counts via the mergeable HLL register
    // sketch on the house md5 hash: the only exchange per column is
    // the ≤ 4096-row register aggregate — flat in corpus size, where
    // count(DISTINCT doc_id) would shuffle every distinct value
    "q_stats_distinct" -> ((s, dir) =>
      graft.operators.Stats.approxDistinct(t(s, dir, "documents"),
        Seq("lang", "source", "doc_id"))),

    // the incremental form: per-source register shards persist to
    // parquet, then merge by MAX without rescanning documents —
    // exactly mergeable, so merged == direct under the SAME oracle
    "q_stats_distinct_shards" -> ((s, dir) => {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cardshards_" + runTag(dir)).getPath
      graft.operators.Stats.writeCardinalityShards(
        t(s, dir, "documents"), work,
        Seq("lang", "source", "doc_id"), Seq("source"))
      graft.operators.Stats.cardinalityFromShards(s, work,
        Seq("lang", "source", "doc_id"))
    }),

    // equal-width distribution profile of lineitem prices: one pass,
    // one bounded shuffle, only observed bins emitted
    "q_stats_histogram" -> ((s, dir) =>
      graft.operators.Stats.histogram(t(s, dir, "lineitem"),
        "l_extendedprice", binWidth = 5000.0)),

    // total-mass drift (PSI) between the click and purchase value
    // distributions — the integral companion to q_stats_ks's
    // max-statistic over the same 5.0-wide bins
    "q_stats_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.psiDrift(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "value", binWidth = 5.0)
    }),

    // corpus-percentile score normalization at bin resolution — the
    // scale-correct percent_rank (no global-order window anywhere)
    "q_stats_ecdf" -> ((s, dir) =>
      graft.operators.Stats.ecdfNormalize(
        t(s, dir, "events").select("event_id", "value"), "value",
        bins = 100)),

    // reliability diagram: does a 0.9 "probability" hit 90%? fixed
    // [0,1] bins, decimal-summed prediction mass, round-6 rates
    "q_stats_calibration" -> ((s, dir) =>
      graft.operators.Stats.calibrationCurve(
        t(s, dir, "lineitem").select(
          (col("l_discount") * 10).as("p"),
          (col("l_quantity") > 25).as("y")),
        "p", "y", bins = 10)),

    // equi-depth profile of the (skewed) event values: ~equal-count
    // buckets at the exact interpolated octile thresholds
    "q_stats_histogram_eq" -> ((s, dir) =>
      graft.operators.Stats.equiDepthHistogram(t(s, dir, "events"),
        "value", bins = 8)),

    // key-skew diagnostic over the order join key: top keys, shares,
    // and the max/mean ratio that floors a saltedJoin factor
    "q_join_skewreport" -> ((s, dir) =>
      graft.operators.Skew.keySkewReport(t(s, dir, "lineitem"),
        Seq("l_suppkey"), topN = 10)),

    // linear multi-touch attribution: purchases credit the user's
    // touch types inside a 6 h lookback, 1/n each (round-6 decimal)
    "q_events_attribution" -> ((s, dir) =>
      graft.operators.Events.attributeConversions(t(s, dir, "events"),
        conversionType = "purchase", lookbackSeconds = 21600L,
        model = "linear")),

    // SCD2 validity intervals over each user's event-type change log:
    // consecutive repeats collapse to runs, runs stitch into half-open
    // [valid_from, valid_to) with the open tail marked current
    "q_events_scd2" -> ((s, dir) =>
      graft.operators.Events.scd2(t(s, dir, "events"),
        "user_id", "event_type")),

    // first-order Markov transition matrix over per-user sequences:
    // one user-keyed lead window, counts collapse to |types|^2 cells
    // before the exchange, normalization over the matrix frame only
    "q_events_transitions" -> ((s, dir) =>
      Events.transitionMatrix(t(s, dir, "events"))),

    // recency-weighted activity: decay-1/2 sum over each user's 8 most
    // recent events — every weight a power of two, terms exact on the
    // round-9 decimal lattice, DECIMAL-summed (order-free)
    "q_events_decayed" -> ((s, dir) =>
      Events.decayedActivity(t(s, dir, "events"))),

    // top 3-step journeys: one window for both leads, |types|^3-capped
    // partial agg, TakeOrderedAndProject with (count, path) determinism
    "q_events_paths" -> ((s, dir) =>
      Events.topPaths(t(s, dir, "events"), k = 3, topN = 20)),

    // exact weighted draw: 100 docs without replacement, inclusion
    // ∝ length — the ES key ln(u)/w ranked via TakeOrderedAndProject
    "q_sample_weighted_k" -> ((s, dir) =>
      graft.operators.Curation.sampleWeightedTopK(
        t(s, dir, "documents").select("doc_id", "lang", "source",
          "n_chars"),
        col("n_chars").cast("double"), k = 100,
        keyCols = Seq("doc_id"))),

    // anti-domination gate: at most 50 docs per source, chosen by
    // content-hash pseudo-order (an unbiased, reproducible subset)
    "q_sample_cap" -> ((s, dir) =>
      graft.operators.Curation.capPerGroup(
        t(s, dir, "documents").select("doc_id", "lang", "source"),
        Seq("source"), n = 50, keyCols = Seq("doc_id"))),

    // tokenizer-vocab acceptance test: vocab trained on the 90% split,
    // per-doc OOV rate measured on the held 10%
    "q_text_oov" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = TextAnalysis.buildVocab(
        docs.filter(col("doc_id") % 10 =!= 0), "text", topN = 500)
      TextAnalysis.vocabCoverage(
        docs.filter(col("doc_id") % 10 === 0), vocab)
    }),

    // HITS hubs/authorities over the same directed supplier->part
    // graph as pagerank: two L1-normalized mutual-recursion rounds on
    // the integer lattice, display-rounded in integer arithmetic
    "q_graph_hits" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Graph.hits(
        li.select(col("l_suppkey").as("src"),
          (col("l_partkey") + 10000000L).as("dst")),
        "src", "dst", iters = 2)
    }),

    "q_graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Graph.pageRank(
        li.select(col("l_suppkey").as("src"),
          (col("l_partkey") + 10000000L).as("dst")),
        "src", "dst", iters = 3)
    }),

    // personalized PageRank (TrustRank shape) on the same graph:
    // teleport mass returns only to a vetted supplier seed slice —
    // rank becomes proximity-to-trust; the oracle unrolls the same
    // 3 seeded iterations on the same integer lattice
    "q_graph_ppr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Graph.personalizedPageRank(
        li.select(col("l_suppkey").as("src"),
          (col("l_partkey") + 10000000L).as("dst")),
        li.filter(col("l_suppkey") % 17 === 0)
          .select(col("l_suppkey").as("node")),
        "src", "dst", iters = 3)
    }),

    // multi-source BFS radius from the vetted supplier seed slice
    // over the undirected supplier-part graph: dist 0 the seeds,
    // dist 1 their parts, dist 2 co-suppliers, dist 3 those
    // suppliers' parts; unreached nodes absent. The oracle replays
    // the same frontier expansion as a recursive CTE with min-dist
    "q_graph_bfs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Graph.bfsDistances(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst",
        li.filter(col("l_suppkey") % 17 === 0)
          .select(col("l_suppkey").cast("long").as("node")),
        "node", maxHops = 3)
    }),

    // HyperBall harmonic centrality over the thinned (qty > 40)
    // supplier-part graph: per-node HLL registers (m = 16) max-merge
    // along edges — register state is ≤ m per node REGARDLESS of ball
    // size, the property that makes centrality tractable at 100 TB.
    // Register merge is exactly set union, so the only approximation
    // is the final fixed-shape estimate — the oracle unrolls the same
    // three rounds and replicates every estimate digit-for-digit
    "q_graph_harmonic" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 40)
      graft.operators.Graph.harmonicCentrality(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", iters = 3, b = 4)
    }),

    // hop-bounded weighted shortest paths from the vetted supplier
    // slice over the sparse (qty > 45) supplier-part graph: quantity
    // as edge cost, 2 relaxation rounds — the oracle enumerates every
    // ≤2-hop walk recursively and takes the min total weight
    "q_graph_sssp" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      graft.operators.Graph.shortestPaths(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst"),
          col("l_quantity").as("w")),
        "src", "dst", "w",
        li.filter(col("l_suppkey") % 17 === 0)
          .select(col("l_suppkey").cast("long").as("node")),
        "node", maxHops = 2)
    }),

    // HyperBall closeness on the same graph: reciprocal mean distance
    // to reached nodes within 3 hops — ΔE units weighted by radius in
    // exact longs, two fixed-shape double divisions
    "q_graph_closeness" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 40)
      graft.operators.Graph.closenessCentrality(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", iters = 3, b = 4)
    }),

    // the global HyperBall report on the same graph: N(k) = Σ ball
    // estimates per radius (exact long sums of lattice units), with
    // frac = N(k)/N(3) — the effective-diameter curve in 4 rows
    "q_graph_nf" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 40)
      graft.operators.Graph.neighborhoodFunction(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", iters = 3, b = 4)
    }),

    // deterministic random walks over the sparse (qty > 45)
    // supplier-part graph: one 3-step walk per node, neighbor picked
    // by hash48(start|cur|k|seed) mod degree on the sorted adjacency
    // index — node2vec-style training-corpus generation that is
    // bit-replayable (same seed → same walks under any partitioning),
    // so the oracle replicates every hop exactly
    "q_graph_walks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      graft.operators.Graph.deterministicWalks(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", steps = 3, seed = "s42")
    }),

    // the SEEDED, hub-degree-proof form: walks only from the %17
    // supplier slice, neighbor picked by element_at into capped
    // per-bucket sorted adjacency arrays (cap 8 here so the bucket
    // split actually exercises at this SF) — same hash grammar, so
    // the oracle replays the identical hops from the seed slice
    "q_graph_walks_seeded" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val edges = li.select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).cast("long").as("dst"))
      graft.operators.Graph.seededWalks(edges, "src", "dst",
        edges.filter(col("src") % 17 === 0)
          .select(col("src").as("node")),
        "node", steps = 3, seed = "s42", bucketCap = 8)
    }),

    // skip-gram (center, context) pairs within window 2 over the
    // walk corpus — the node2vec/DeepWalk training-data step; the
    // oracle self-joins its replayed walk positions
    "q_graph_walk_pairs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val walks = graft.operators.Graph.deterministicWalks(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", steps = 3, seed = "s42")
      graft.operators.Graph.walkPairs(walks, window = 2)
    }),

    // the COMPLETE node2vec training pipeline in-engine: seeded walks
    // → skip-gram pairs → hash-seeded negatives → full-batch
    // logistic embedding training on the decimal lattice. The oracle
    // replays every stage INCLUDING both gradient-descent iterations
    "q_graph_embeddings" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val edges = li.select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).cast("long").as("dst"))
      val walks = graft.operators.Graph.seededWalks(edges, "src",
        "dst", edges.filter(col("src") % 17 === 0)
          .select(col("src").as("node")),
        "node", steps = 3, seed = "s42", bucketCap = 8)
      val pairs = graft.operators.Graph.walkPairs(walks, window = 2)
      val negs = graft.operators.Graph.skipGramNegatives(pairs,
        k = 2, seed = "n7")
      val ex = pairs
        .select(col("center"), col("context"), lit(1).as("label"))
        .unionByName(negs.select(col("center"),
          col("negative").as("context"), lit(0).as("label")))
      graft.operators.Graph.trainNodeEmbeddings(ex, dim = 4,
        iters = 2, lr = 0.5, seed = "e0")
    }),

    // the trainer's convergence curve: per-iteration full-batch
    // log-loss over the SAME training run (loss measured on the model
    // entering each round — iteration 1 is the init) on the 1e-9
    // integer lattice; the oracle replays both rounds' sigmoids and
    // ln terms digit-exact
    "q_graph_embed_loss" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val edges = li.select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).cast("long").as("dst"))
      val walks = graft.operators.Graph.seededWalks(edges, "src",
        "dst", edges.filter(col("src") % 17 === 0)
          .select(col("src").as("node")),
        "node", steps = 3, seed = "s42", bucketCap = 8)
      val pairs = graft.operators.Graph.walkPairs(walks, window = 2)
      val negs = graft.operators.Graph.skipGramNegatives(pairs,
        k = 2, seed = "n7")
      val ex = pairs
        .select(col("center"), col("context"), lit(1).as("label"))
        .unionByName(negs.select(col("center"),
          col("negative").as("context"), lit(0).as("label")))
      graft.operators.Graph.trainNodeEmbeddingsLoss(ex, dim = 4,
        iters = 2, lr = 0.5, seed = "e0")
    }),

    // node2vec second-order (p=1, q=4 — outward-exploring) biased
    // walks on the same graph: integer-lattice weights {q, pq, p},
    // draw by hash48(start|prev|cur|k|seed) mod total over the
    // cumulative-weight intervals; the oracle rebuilds the weighted
    // edge-successor table and replays every draw
    "q_graph_node2vec" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      graft.operators.Graph.node2vecWalks(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", steps = 3, p = 1, q = 4, seed = "s42")
    }),

    // the SEEDED, hub-degree-proof second-order form: (p, q)-biased
    // walks only from the %17 supplier slice, successor picked from
    // capped cumulative-weight buckets (cap 8 here so both bucket
    // splits actually exercise at this SF) — same draw grammar as the
    // twin, so the oracle replays the identical hops from the slice
    "q_graph_node2vec_seeded" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val edges = li.select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey") + 10000000L).cast("long").as("dst"))
      graft.operators.Graph.node2vecSeededWalks(edges, "src", "dst",
        edges.filter(col("src") % 17 === 0)
          .select(col("src").as("node")),
        "node", steps = 3, p = 1, q = 4, seed = "s42", bucketCap = 8)
    }),

    // hash-seeded negative sampling over the pair corpus (2 draws
    // per positive from the bucketed-ranked vocabulary) — the oracle
    // replays every draw from the same md5 grammar
    "q_graph_walk_negatives" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      val walks = graft.operators.Graph.deterministicWalks(
        li.select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + 10000000L).cast("long").as("dst")),
        "src", "dst", steps = 3, seed = "s42")
      graft.operators.Graph.skipGramNegatives(
        graft.operators.Graph.walkPairs(walks, window = 2),
        k = 2, seed = "n7")
    }),

    // Adamic-Adar link prediction over the same (folded-undirected)
    // supplier-part graph: top-20 non-edges by rare-common-neighbor
    // mass; hub centers above degree 64 skip (the bounded-wedge
    // contract), decimal-summed 1/ln(deg) terms
    "q_graph_adamic" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Graph.adamicAdar(
        li.select(col("l_suppkey").as("src"),
          (col("l_partkey") + 10000000L).as("dst")),
        "src", "dst", topN = 20, maxDegree = 64)
    }),

    // connected components over a temporal co-presence graph: events of
    // the same type within 30 min link into burst chains — path-shaped
    // components, i.e. the worst case for diameter-bound min-label
    // propagation and exactly where the O(log n)-round star alternation
    // earns its keep. The oracle recovers the same components
    // independently as gap-delimited runs
    "q_graph_components" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val edges = t(s, dir, "events")
        .select(col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          (unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w))).as("gap"))
        .filter(col("prev_id").isNotNull &&
          col("gap") <= lit(1800L * 1000000L))
      graft.operators.Graph.connectedComponents(
        edges, "prev_id", "event_id")
    }),

    // per-node triangles + clustering coefficient over the supplier
    // co-order graph (suppliers sharing a high-quantity order line):
    // community-vs-link-farm density signal; the qty>45 thinning keeps
    // the graph sparse so clustering is non-trivial. Oracle enumerates
    // triangles exhaustively
    "q_graph_triangles" -> ((s, dir) =>
      graft.operators.Graph.triangleCounts(
        coOrderEdges(s, dir), "src", "dst")),

    // 15-core of the same graph: iterative peeling to the maximal
    // subgraph of min-degree >= 15 — the structural spam/ring filter;
    // k sits inside the degree distribution (median 21), so the peel
    // genuinely cascades (4 rounds, 18 of 100 nodes removed at sf0.01);
    // oracle unrolls the rounds (extras past fixpoint are no-ops)
    "q_graph_kcore" -> ((s, dir) =>
      graft.operators.Graph.kCore(coOrderEdges(s, dir), "src", "dst",
        k = 15)),

    // label-propagation communities over the same co-order graph:
    // synchronous rounds with the (count desc, label asc) tie-break are
    // a pure function of graph + round count — oracle unrolls 3 rounds
    "q_graph_lpa" -> ((s, dir) =>
      graft.operators.Graph.labelPropagation(coOrderEdges(s, dir),
        "src", "dst", iters = 3)),

    // degree assortativity: one-number crawl-graph health diagnostic
    // (negative = hub-leaf wiring, the web's signature)
    "q_graph_assortativity" -> ((s, dir) =>
      graft.operators.Graph.assortativity(
        coOrderEdges(s, dir), "src", "dst")),

    // corpus-relative quality gate: keep docs at/above the 0.6-quantile
    // of a simple length-quality proxy (distinct-token count)
    "q_curation_quantile" -> ((s, dir) =>
      Curation.filterByQuantile(
          t(s, dir, "documents").withColumn("n_types",
            size(array_distinct(split(col("text"), " "))).cast("double")),
          col("n_types"), q = 0.6)
        .select(col("doc_id"), col("n_types"))),

    // token-budget curriculum selection: per language, take documents
    // best-first (longest here — the deterministic stand-in for a model
    // quality score) until the 2k-token budget is spent; prefix
    // semantics make the kept set a contiguous quality prefix
    "q_curation_budget" -> ((s, dir) =>
      Curation.selectByTokenBudget(t(s, dir, "documents"),
          budgetTokens = 2000, domainCols = Seq("lang"),
          quality = col("n_chars"), idCol = "doc_id",
          tokens = size(split(col("text"), " ")))
        .select("doc_id", "lang", "cum_tokens")),

    // DSIR-style importance weights: every doc scored by target-vs-raw
    // hashed-unigram log-likelihood ratio (target = the English split);
    // positive log_ratio = looks like the target corpus
    "q_sample_importance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.importanceWeights(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 1024)
    }),

    // distributed logistic-regression training: 3 full-batch GD rounds
    // for an is-English classifier over 32 md5-hashed presence buckets
    // — gradients decimal-summed, updates round-9, so the TRAINED MODEL
    // replicates bit-for-bit in the unrolled SQL oracle
    "q_text_logreg" -> ((s, dir) =>
      TextClassify.trainLogisticHashed(
        t(s, dir, "documents").withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en", dim = 32, iters = 3, lr = 1.0)),

    // train THEN score: the round-6 published model applied to every
    // document via the zero-shuffle compiled decimal fold — the full
    // quality-filter inference path, end-to-end oracled
    "q_text_logreg_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val wts = TextClassify.trainLogisticHashed(
        docs.withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en", dim = 32, iters = 3, lr = 1.0)
      TextClassify.scoreLogisticInline(docs, wts)
    }),

    // persisted classifier weights: train -> writeLogisticModel ->
    // load -> score; q_text_logreg_score's oracle verbatim
    "q_text_logreg_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_logreg_model_" +
          runTag(dir)).getPath
      graft.operators.ModelStore.writeLogisticModel(
        TextClassify.trainLogisticHashed(
          docs.withColumn("is_en", col("lang") === "en"),
          "doc_id", "text", "is_en", dim = 32, iters = 3, lr = 1.0),
        store)
      TextClassify.scoreLogisticInline(docs,
        graft.operators.ModelStore.logisticFromModel(s, store))
    }),

    // Naive-Bayes language classifier: train on 90% of the corpus with
    // its lang labels, classify the held-out 10% — the exact-arithmetic
    // stand-in for a fastText-style curation filter model
    "q_text_classify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextClassify.naiveBayesClassify(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        labelCol = "lang", idCol = "doc_id", textCol = "text",
        keepCols = Seq("lang"))
    }),

    // exact positional phrase search over the corpus: per distinct
    // phrase LENGTH one map-side gram pass, broadcast phrase join, the
    // one shuffle carries hit positions only (match-proportional, like
    // bm25's postings); overlapping occurrences count, first position
    // reported
    "q_text_phrase" -> ((s, dir) => {
      import s.implicits._
      val phrases = Seq(
        (0, "table hash"), (1, "customer join"), (2, "merge group"),
        (3, "slow hash batch"), (4, "window fast query"))
        .toDF("query_id", "phrase")
      TextSearch.phraseSearch(t(s, dir, "documents"), phrases)
    }),

    // Cavnar-Trenkle rank-order language ID: per-lang char-trigram rank
    // profiles from the train split (a labels x topN broadcast model),
    // out-of-place distance with a topN penalty per unmatched doc gram.
    // topM = 30 < the per-doc trigram inventory, so the doc-profile
    // cutoff, the penalty base term, and the matched-gram adjustment
    // are all exercised; integer arithmetic end-to-end
    "q_text_langid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextClassify.rankOrderClassify(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        labelCol = "lang", idCol = "doc_id", textCol = "text",
        n = 3, topN = 50, topM = 30, keepCols = Seq("lang"))
    }),

    // token-budget sequence packing: concat-then-chunk assignment per
    // language shard, one row per pack
    "q_text_pack" -> ((s, dir) =>
      Curation.packSequences(t(s, dir, "documents"), budgetTokens = 2048,
        shardCols = Seq("lang"), idCol = "doc_id", textCol = "text")),

    // benchmark decontamination: every 10th doc plays the benchmark set;
    // corpus docs sharing ≥5 distinct trigram shingles with it are
    // flagged (the benchmark shingle index broadcasts — map-side sweep)
    "q_curation_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Curation.contaminationFlags(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, minShared = 5)
    }),

    // PII scrubbing over synthetic-augmented text (the corpus carries no
    // PII, so each doc gets a planted email + phone; both must come out
    // typed)
    "q_text_scrub" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.scrubPii(concat(col("text"),
          lit(" contact: user"), col("doc_id").cast("string"),
          lit("@example.com or 555-123-4567"))).as("scrubbed"))),

    // symmetric int8 embedding quantization: per-vector scale, exact
    // integer code checksum, and the dequantized self-cosine (the
    // fidelity the compression trades storage for)
    "q_sim_quantized" -> ((s, dir) => {
      import graft.functions.{Quantize, VectorFunctions => VF}
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      emb.withColumn("scale", Quantize.int8Scale(col("e")))
        .withColumn("codes", Quantize.int8Codes(col("e"), col("scale")))
        .withColumn("deq", Quantize.int8Dequantize(col("codes"), col("scale")))
        .select(col("vec_id"),
          round(col("scale"), 9).as("scale"),
          aggregate(col("codes"), lit(0L), (acc, c) => acc + c)
            .as("code_sum"),
          round(VF.cosineWithNorms(VF.dotProduct(col("e"), col("deq")),
            VF.l2Norm(col("e")), VF.l2Norm(col("deq"))), 6).as("fidelity"))
    }),

    // top-5 over the int8-quantized corpus, scored ENTIRELY in integer
    // dots (scales cancel in cosine) — deterministic, exactly oracled
    "q_sim_topk_int8" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // the persisted SQ8 (IVF + int8) index — train float, persist codes,
    // prune files, score integers; nprobe = nlist probes every cell so
    // the ranking provably equals quantizedTopK (same oracle)
    "q_sim_ivf_int8" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivf_sq8_" + runTag(dir)).getPath
      val centroids = Similarity.buildIvfIndexQuantized(emb, "vec_id",
        "embedding", idx, nlist = 16, lloydIters = 1)
      Similarity.ivfTopKIndexedQuantized(idx, centroids,
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 16)
    }),

    // corpus-trained bigram LM, self-scored: mean log-probability per
    // document (the perplexity-proxy quality signal); per-bigram
    // log-probs decimal-summed for order independence
    "q_text_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = LanguageModel.trainBigram(docs, "doc_id", "text")
      LanguageModel.scoreByBigram(docs, lm, "doc_id", "text", k = 0.5)
    }),

    // cross-corpus LM scoring: train on 90% of the corpus, score the
    // held-out 10% — exercises the unseen-bigram paths (unknown w1 AND
    // known-w1/unknown-w2) under the gate; vocab passed explicitly from
    // the TRAINING split, as a real held-out evaluation would
    "q_text_lm_heldout" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val lm = LanguageModel.trainBigram(train, "doc_id", "text")
      val v = train.select(explode(split(col("text"), " ")).as("w"))
        .agg(count_distinct(col("w"))).head.getLong(0)
      LanguageModel.scoreByBigram(held, lm, "doc_id", "text", k = 0.5,
        vocab = Some(v))
    }),

    // Kneser-Ney held-out scoring: same train/held split as
    // q_text_lm_heldout but with continuation-probability smoothing —
    // the CCNet-style fluency filter; exercises known-context,
    // unseen-bigram, and unknown-context paths under the gate
    "q_text_lm_kn" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val lm = LanguageModel.trainBigram(train, "doc_id", "text")
      LanguageModel.scoreByKneserNey(held, lm, "doc_id", "text",
        discount = 0.75)
    }),

    // persisted bigram LM: train -> writeLmModel (range-sharded on w1)
    // -> load -> KN-score the held slice; q_text_lm_kn's oracle
    // verbatim — the stored model scores bit-identically
    "q_text_lm_kn_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_lm_model_" + runTag(dir)).getPath
      graft.operators.ModelStore.writeLmModel(
        LanguageModel.trainBigram(train, "doc_id", "text"), store)
      LanguageModel.scoreByKneserNey(held,
        graft.operators.ModelStore.lmFromModel(s, store),
        "doc_id", "text", discount = 0.75)
    }),

    // order-3 interpolated Kneser-Ney (the CCNet paper's own model
    // family is 5-gram KN; order 3 is the oracled default, the
    // machinery supports 5): raw counts at the top order,
    // CONTINUATION counts through the backoff chain, add-half unigram
    // floor — every backoff depth exercised on the held split and
    // replicated in the oracle
    "q_text_lm_kn3" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val lm = LanguageModel.trainNgrams(train, "doc_id", "text",
        maxN = 3)
      LanguageModel.scoreByKneserNeyN(held, lm, "doc_id", "text",
        order = 3, discount = 0.75)
    }),

    // order-5 interpolated Kneser-Ney — the CCNet paper's actual
    // model order: four backoff levels (raw 5-gram counts, then
    // continuation counts at orders 4/3/2, then the unigram floor),
    // generated-oracle replicated term-for-term
    "q_text_lm_kn5" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val lm = LanguageModel.trainNgrams(train, "doc_id", "text",
        maxN = 5)
      LanguageModel.scoreByKneserNeyN(held, lm, "doc_id", "text",
        order = 5, discount = 0.75)
    }),

    // the persisted n-gram stack: train -> writeNgramModel (sharded
    // on (ord, w1), maxN in meta) -> load -> order-3 KN score;
    // q_text_lm_kn3's oracle verbatim
    "q_text_lm_kn3_stored" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ngram_model_" +
          runTag(dir)).getPath
      graft.operators.ModelStore.writeNgramModel(
        LanguageModel.trainNgrams(train, "doc_id", "text", maxN = 3),
        store, maxN = 3)
      LanguageModel.scoreByKneserNeyN(held,
        graft.operators.ModelStore.ngramsFromModel(s, store),
        "doc_id", "text", order = 3, discount = 0.75)
    }),

    // chi-square token-label association (one-vs-rest, df floor 5,
    // top 10 per language): the feature-selection pass before training
    // a curation classifier — all cell counts exact integers, one
    // double formula, bounded per-label rank
    "q_text_chisq" -> ((s, dir) =>
      TextClassify.chiSquareTokens(t(s, dir, "documents"), "lang",
        topN = 10, minDf = 5)),

    // CCNet-style perplexity bucketing (Wenzek 2020): the held split's
    // KN fluency scores banded into head/middle/tail at the exact
    // tercile thresholds — the curation step between scoring and
    // mixing; thresholds are two bounded driver scalars, banding a
    // scan-speed projection
    "q_text_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val held = docs.filter(col("doc_id") % 10 === 0)
      val lm = LanguageModel.trainBigram(train, "doc_id", "text")
      val scored = LanguageModel.scoreByKneserNey(held, lm,
        "doc_id", "text", discount = 0.75)
      Curation.bucketByQuantile(scored, col("avg_logprob"))
        .select(col("doc_id"), col("avg_logprob"), col("bucket"))
    }),

    // exact BM25 top-10 for five fixed queries over the corpus — the
    // retrieval operator; per-term scores decimal-summed so document
    // scores are summation-order-independent (hash-comparable)
    "q_text_bm25" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq((0L, "spark join fast"), (1L, "vector scan slow"),
        (2L, "customer order line"), (3L, "window agg group"),
        (4L, "hash merge sort batch")).toDF("query_id", "qtext")
      TextSearch.bm25TopK(t(s, dir, "documents"), queries, k = 10)
    }),

    // Dirichlet query-likelihood over the same five queries: the
    // language-modeling ranking function beside BM25 (mu = 2000,
    // Zhai-Lafferty default), decimal-exact score decomposition
    "q_text_ql" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq((0L, "spark join fast"), (1L, "vector scan slow"),
        (2L, "customer order line"), (3L, "window agg group"),
        (4L, "hash merge sort batch")).toDF("query_id", "qtext")
      TextSearch.queryLikelihoodTopK(t(s, dir, "documents"), queries,
        k = 10)
    }),

    // the same retrieval against the PERSISTED inverted index:
    // build -> probe inside the timed query (the store-query pattern —
    // steady-state probe cost is the BASELINE.md scale table); scores
    // and ranking identical to q_text_bm25 by construction
    "q_text_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq((0L, "spark join fast"), (1L, "vector scan slow"),
        (2L, "customer order line"), (3L, "window agg group"),
        (4L, "hash merge sort batch")).toDF("query_id", "qtext")
      val idx = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_bm25idx_" + runTag(dir)).getPath
      TextSearch.writeSearchIndex(t(s, dir, "documents"), idx)
      TextSearch.bm25FromIndex(s, idx, queries, k = 10)
    }),

    // q_text_bm25_indexed replayed as TWO pure-JSON configs — a job
    // config that builds the persisted index (write_search_index
    // sink) and a probe config that scores a query table against it
    // (bm25_from_index step) — under the identical oracle: the
    // config registry's index-once/probe-many workflow end to end
    "q_pipeline_indexed" -> ((s, dir) => {
      import s.implicits._
      val tmp = sys.props("java.io.tmpdir")
      val tag = runTag(dir)
      val idx = new java.io.File(tmp, s"graft_cfgidx_$tag").getPath
      val qPath = new java.io.File(tmp, s"graft_cfgq_$tag").getPath
      Seq((0L, "spark join fast"), (1L, "vector scan slow"),
        (2L, "customer order line"), (3L, "window agg group"),
        (4L, "hash merge sort batch")).toDF("query_id", "qtext")
        .coalesce(1).write.mode("overwrite").parquet(qPath)
      graft.operators.Pipeline.runJobJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |   "table": "documents"}},
           |  {"op": "write_search_index", "params": {"path": "$idx"}}
           |]""".stripMargin)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_parquet", "params": {"path": "$qPath"}},
           |  {"op": "bm25_from_index",
           |   "params": {"index_path": "$idx", "k": 10}}
           |]""".stripMargin)
    }),

    // q_dedup_store replayed as configs: persist the held corpus's
    // band signatures (write_signature_store sink), then probe the
    // arriving batch against the store (near_dup_pairs_stored step)
    // — identical oracle to the in-memory incremental join
    "q_pipeline_dedup_store" -> ((s, dir) => {
      val store = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cfgsig_" + runTag(dir)).getPath
      graft.operators.Pipeline.runJobJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |   "table": "documents"}},
           |  {"op": "filter", "params": {"condition": "doc_id % 5 != 0"}},
           |  {"op": "write_signature_store",
           |   "params": {"path": "$store", "n": 3, "num_hashes": 64,
           |              "bands": 32}}
           |]""".stripMargin)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |   "table": "documents"}},
           |  {"op": "filter", "params": {"condition": "doc_id % 5 = 0"}},
           |  {"op": "near_dup_pairs_stored",
           |   "params": {"store_path": "$store", "threshold": 0.5}}
           |]""".stripMargin)
    }),

    // q_sim_ivf_indexed replayed as configs: build_ann_index persists
    // the cell-partitioned index AND the centroid table; the probe
    // config loads centroids at compile time and prunes cells at the
    // file level. nprobe = nlist ⇒ exact, same brute-force oracle.
    "q_pipeline_ann" -> ((s, dir) => {
      val tmp = sys.props("java.io.tmpdir")
      val tag = runTag(dir)
      val idx = new java.io.File(tmp, s"graft_cfgivf_$tag").getPath
      val cents = new java.io.File(tmp, s"graft_cfgcent_$tag").getPath
      graft.operators.Pipeline.runJobJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |   "table": "embeddings"}},
           |  {"op": "build_ann_index",
           |   "params": {"index_path": "$idx", "centroids_path": "$cents",
           |              "id_col": "vec_id", "vec_col": "embedding",
           |              "nlist": 16, "lloyd_iters": 1}}
           |]""".stripMargin)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |   "table": "embeddings"}},
           |  {"op": "filter", "params": {"condition": "vec_id < 10"}},
           |  {"op": "ann_topk_indexed",
           |   "params": {"index_path": "$idx", "centroids_path": "$cents",
           |              "id_col": "vec_id", "vec_col": "embedding",
           |              "k": 5, "nprobe": 16}}
           |]""".stripMargin)
    }),

    // q_stats_profile_shards replayed as configs: write_profile_shards
    // sink persists the per-status summaries, profile_from_shards
    // SOURCE merges them without rescanning orders — same oracle
    "q_pipeline_profile" -> ((s, dir) => {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cfgprof_" + runTag(dir)).getPath
      graft.operators.Pipeline.runJobJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |   "table": "orders"}},
           |  {"op": "write_profile_shards",
           |   "params": {"path": "$work",
           |              "cols": ["o_totalprice", "o_custkey"],
           |              "shard_cols": ["o_orderstatus"]}}
           |]""".stripMargin)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "profile_from_shards",
           |   "params": {"path": "$work",
           |              "cols": ["o_totalprice", "o_custkey"]}}
           |]""".stripMargin)
    }),

    // incremental index maintenance: build on the 90% slice, MERGE the
    // 10% delta (delta-only tokenization), probe the merged index —
    // scored under the FULL-corpus oracle, so merge==rebuild is the
    // correctness statement itself
    "q_text_bm25_merged" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq((0L, "spark join fast"), (1L, "vector scan slow"),
        (2L, "customer order line"), (3L, "window agg group"),
        (4L, "hash merge sort batch")).toDF("query_id", "qtext")
      val docs = t(s, dir, "documents")
      val sfx = runTag(dir)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_bm25base_" + sfx).getPath
      val merged = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_bm25merged_" + sfx).getPath
      TextSearch.writeSearchIndex(
        docs.filter(col("doc_id") % 10 =!= 0), base)
      TextSearch.mergeSearchIndex(s, base,
        docs.filter(col("doc_id") % 10 === 0), merged)
      TextSearch.bm25FromIndex(s, merged, queries, k = 10)
    }),

    // hybrid retrieval: the same five text queries' BM25 top-20 fused
    // with their query VECTORS' exact cosine top-20 (vec_id 0-4 ↔
    // query_id 0-4; the corpus id spaces align 1:1) via reciprocal-rank
    // fusion — only ranks cross the fusion boundary, so no score
    // calibration; decimal-summed contributions keep the fused score
    // hash-comparable
    "q_text_hybrid" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq((0L, "spark join fast"), (1L, "vector scan slow"),
        (2L, "customer order line"), (3L, "window agg group"),
        (4L, "hash merge sort batch")).toDF("query_id", "qtext")
      val sparse = TextSearch.bm25TopK(t(s, dir, "documents"), queries,
        k = 20)
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20,
          includeScore = false)
        .withColumnRenamed("neighbor_id", "doc_id")
      TextSearch.rrfFuse(Seq(sparse, dense), k = 10)
    }),

    // ---- multimodal plumbing (payload + metadata; stub features are
    //      covered by OperatorsSpec, not SQL-expressible) ----

    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.asAssets(t(s, dir, "documents"), "doc_id", "text",
          "text/plain", "source")
        .select(col("id"), col("meta.mime").as("mime"),
          col("meta.source").as("source"),
          col("meta.n_bytes").as("n_bytes"))),

    // frames are emitted hex-encoded so the driver's pandas sort-then-hash
    // compare sees strings on both sides (raw binary is unhashable there)
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.asAssets(t(s, dir, "documents"), "doc_id", "text",
            "text/plain", "source"),
          frameBytes = 64, everyN = 3)
        .select(col("id"), col("frame_index"),
          hex(col("frame")).as("frame_hex"))),

    // audio near-dup: REAL RIFF/PCM parse → energy-envelope delta
    // fingerprint (exact integer energies) → the banded pHash pair
    // machinery on the audio hash. The oracle recomputes every
    // sample, energy, and comparison bit from the fixture's integer
    // grammar and takes ALL-PAIRS Hamming ground truth — so the
    // banded join's recall (pigeonhole: hamming 4 < 8 chunks) is
    // itself under test, not just the hash
    "q_multimodal_audiodup" -> ((s, dir) =>
      Multimodal.audioNearDupPairs(
        Multimodal.audioFingerprints(wavAssetsFixture(s, dir),
          frameSize = 32, nFrames = 65),
        hammingMax = 4, chunks = 8)),

    // video near-dup: REAL RIFF/AVI movi walk → per-frame integer
    // grid-delta hashes → banded aligned-sequence pairing (candidates
    // from the position-0 hash chunks, exact max-per-position verify
    // on candidates only). The oracle replays every pixel, block sum,
    // and hash bit from the fixture's integer grammar and takes
    // ALL-PAIRS sequence ground truth — so banding recall is itself
    // under test, exactly like the audio leg
    "q_multimodal_videodup" -> ((s, dir) =>
      Multimodal.videoNearDupPairs(
        Multimodal.videoFingerprints(aviAssetsFixture(s, dir),
          stride = 1, maxFrames = 8),
        hammingMax = 4, chunks = 8)),

    // ---- relational anchors (agg / join / window at TPC-H shape) ----

    // Q1-style grouped aggregate; decimal-cast sums → order-independent
    "q_agg_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // CUBE over (returnflag, linestatus): all four grouping-set
    // levels (detail, two rollups, grand total) in ONE Expand-based
    // aggregate — no self-union of scans; explicit grouping() markers
    // disambiguate a rolled-up level from a genuinely-null key
    "q_agg_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))),

    // broadcast-dimension join chain + grouped aggregate
    "q_join_revenue" -> ((s, dir) =>
      t(s, dir, "orders").as("o")
        .join(broadcast(t(s, dir, "customer").as("c")),
          col("o.o_custkey") === col("c.c_custkey"))
        .join(broadcast(t(s, dir, "nation").as("n")),
          col("c.c_nationkey") === col("n.n_nationkey"))
        .groupBy(col("n.n_name").as("n_name"))
        .agg(
          sum(col("o.o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_orders"))),

    // the same revenue rollup as q_join_revenue, but from bucketed copies
    // of orders/customer: the fact-side join is exchange-free (both scans
    // are pre-hashed into 8 matching buckets; merge hint keeps the small
    // side out of a broadcast so the bucketed path is actually exercised)
    // — the only shuffle left is the unavoidable 25-row final aggregate.
    // Plan asserted in ScaleOpsSpec; writes go to the session warehouse.
    "q_join_bucketed" -> ((s, dir) => {
      graft.sources.Bucketing.rewriteBucketed(s,
        t(s, dir, "orders").select("o_custkey", "o_totalprice"),
        "graft_orders_bkt", 8, Seq("o_custkey"), sourceToken = dir)
      graft.sources.Bucketing.rewriteBucketed(s,
        t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        "graft_customer_bkt", 8, Seq("c_custkey"), sourceToken = dir)
      s.table("graft_orders_bkt")
        .join(s.table("graft_customer_bkt").hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // the same rollup once more through the skew-salted join: orders get
    // a content-derived salt (retry-safe), customer replicates per salt,
    // so a hot customer key splits across 8 reducers — result must equal
    // the plain join (same oracle as q_join_revenue)
    "q_join_salted" -> ((s, dir) => {
      val big = t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
      val small = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      graft.operators.Skew.saltedJoin(big, small, Seq("o_custkey"),
          saltFactor = 8)
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // bloom semi-join reduction: a selective dimension (one mktsegment,
    // ~1/5 of customers) is sketched into a bloom filter and the fact
    // side is might_contain-filtered BEFORE its shuffle — no false
    // negatives, so the result equals the plain join row-for-row (the
    // oracle); false positives only cost shuffle rows. The explicit
    // form of the optimizer's runtime filter, guaranteed at any size
    "q_join_bloom" -> ((s, dir) => {
      val fact = t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
      val dim = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_nationkey"))
      graft.operators.Joins.bloomReducedJoin(fact, dim,
          "o_custkey", "c_custkey")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // semi/anti join: segments of customers with vs without orders
    "q_join_semi" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val withOrders = customer
        .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
      val withoutOrders = customer
        .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_inactive"))
      withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_active"), lit(0L)).as("n_active"),
          coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
    }),

    // set operations: union / intersect / except over key domains
    // wide per-user activity-feature matrix: sum(value) by event_type.
    // Values are pinned so the plan is ONE hash aggregate of
    // conditional sums (no discovery pass, schema independent of the
    // data); decimal-summed cells for order-independent comparison
    "q_reshape_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      graft.operators.Reshape.pivotAgg(
          t(s, dir, "events"), Seq("user_id"), "event_type",
          sum(round(col("value"), 9).cast("decimal(28,9)")),
          values = types)
        .select(col("user_id") +:
          types.map(v => round(col(v), 6).cast("double").as(v)): _*)
    }),

    // tidy long form of the four lineitem measures: zero-shuffle
    // Expand projection, one narrow row per (line, measure)
    "q_reshape_melt" -> ((s, dir) =>
      graft.operators.Reshape.melt(
        t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        "measure", "amount")),

    "q_set_ops" -> ((s, dir) => {
      val custNations = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
      val suppNations = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"))
      custNations.union(suppNations).distinct()
        .except(t(s, dir, "nation")
          .filter(col("n_regionkey") === 0)
          .select(col("n_nationkey").cast("int").as("nationkey")))
    }),

    // the Morton (Z-order) clustering key over (l_partkey, l_suppkey):
    // pure integer bit interleaving — the write-time layout that bounds
    // BOTH columns' spans per file (zOrderWrite itself + the measured
    // per-file bounding boxes are asserted in ScaleOpsSpec; the key is
    // what an engine must agree on bit for bit)
    "q_layout_zorder" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        graft.sources.Layout.zValue(
          Seq(col("l_partkey"), col("l_suppkey")), bits = 16).as("zval"))),

    // rendezvous (HRW) shard assignment over the doc corpus: 16-way,
    // md5-48 per-shard scores, argmax with the (score, -s) tie-break —
    // the stable-sharding key for incrementally-maintained stores
    "q_layout_shards" -> ((s, dir) =>
      graft.sources.Layout.rendezvousShards(
        t(s, dir, "documents").select(col("doc_id")),
        Seq("doc_id"), nShards = 16)),

    // small-file compaction round-trip: scatter documents over 64
    // tiny files, compact back toward the byte target (one coalesced
    // file here), read the result — content must be row-identical to
    // the source, which is exactly what the oracle checks
    "q_layout_compact" -> ((s, dir) => {
      val work = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_compact_" + runTag(dir)).getPath
      t(s, dir, "documents").repartition(64)
        .write.mode("overwrite").parquet(work)
      graft.sources.Layout.compact(s, work, targetBytes = 512L << 20)
      s.read.parquet(work)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // dataset-versioning diff: old = docs minus the %11=3 slice, new =
    // docs minus the %7=0 slice with %5=0 texts edited — added/removed/
    // changed rows (and which columns) from one keyed full-outer join;
    // unchanged rows never emit
    "q_layout_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 11 =!= 3)
      val neu = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.sources.Layout.snapshotDiff(old, neu,
        Seq("doc_id"), Seq("text", "lang"))
    }),

    // CDC MERGE: apply a changeset (upserts + deletes, latest seq
    // wins per key) onto a keyed snapshot — inserts (upsert of an
    // absent key), updates, superseded earlier changes, and deletes
    // of absent keys (no-ops) all exercised. The snapshot side is
    // ONE broadcast-able anti join — it never shuffles.
    "q_layout_apply" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val snap = orders.filter(col("o_orderkey") % 4 =!= 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
      graft.sources.Layout.applyChanges(snap,
        cdcChangesFixture(s, dir), Seq("o_orderkey"))
    }),

    // the SAME merge against the bucketed (partition-pruned) layout:
    // snapshot persists hash-partitioned by key, only directories
    // holding changed keys are read and rewritten (pruning + file
    // bit-stability spec-asserted; this fixture's delta touches all
    // buckets, so here the value proven is layout-equivalence) —
    // q_layout_apply's oracle verbatim
    "q_layout_apply_bucketed" -> ((s, dir) => {
      val snapPath = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cdcsnap_" + runTag(dir)).getPath
      val snap = t(s, dir, "orders")
        .filter(col("o_orderkey") % 4 =!= 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
      graft.sources.Layout.writeBucketedSnapshot(snap, snapPath,
        Seq("o_orderkey"), nBuckets = 16)
      graft.sources.Layout.applyChangesBucketed(s, snapPath,
        cdcChangesFixture(s, dir), Seq("o_orderkey"), nBuckets = 16)
      s.read.parquet(snapPath)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
    }),

    // the SAME merge replayed from pure JSON: the changeset persists
    // to parquet and the snapshot chain (source + filter + select +
    // apply_changes) compiles from config — q_layout_apply's oracle
    // verbatim
    "q_pipeline_apply" -> ((s, dir) => {
      val chg = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cfgchg_" + runTag(dir)).getPath
      cdcChangesFixture(s, dir).coalesce(1)
        .write.mode("overwrite").parquet(chg)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "orders"}},
           |  {"op": "filter",
           |   "params": {"condition": "o_orderkey % 4 <> 0"}},
           |  {"op": "select", "params": {"cols":
           |    ["o_orderkey", "o_custkey", "o_orderstatus",
           |     "o_totalprice"]}},
           |  {"op": "apply_changes",
           |   "params": {"changes_path": "$chg",
           |              "key_cols": ["o_orderkey"]}}
           |]""".stripMargin)
    }),

    // the k-anonymity release gate replayed from pure JSON: the
    // suppress_below_k registry step under q_stats_kanon_suppress's
    // oracle verbatim
    "q_pipeline_suppress" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "customer"}},
           |  {"op": "with_column", "params": {"name": "bal_band",
           |    "expr": "CAST(floor(c_acctbal / 1000.0) AS INT)"}},
           |  {"op": "suppress_below_k",
           |   "params": {"quasi_cols": ["c_nationkey", "c_mktsegment",
           |                             "bal_band"],
           |              "k": 5}},
           |  {"op": "select", "params": {"cols":
           |    ["c_custkey", "c_nationkey", "c_mktsegment",
           |     "bal_band"]}}
           |]""".stripMargin)),

    // PSI drift as config: the reference (purchase) side persists to
    // parquet and the config names it — the drift-gate pattern a
    // config-driven pipeline runs against last week's snapshot;
    // q_stats_psi's oracle verbatim
    "q_pipeline_psi" -> ((s, dir) => {
      val ref = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cfgpsi_" + runTag(dir)).getPath
      t(s, dir, "events").filter(col("event_type") === "purchase")
        .select("event_id", "value")
        .write.mode("overwrite").parquet(ref)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "filter",
           |   "params": {"condition": "event_type = 'click'"}},
           |  {"op": "psi_drift",
           |   "params": {"baseline_path": "$ref",
           |              "value_col": "value", "bin_width": 5.0}}
           |]""".stripMargin)
    }),

    // the asset pipeline's config surface: as_assets + nested-meta
    // projections from pure JSON under q_multimodal_meta's oracle
    "q_pipeline_multimodal" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "as_assets",
           |   "params": {"mime": "text/plain", "id_col": "doc_id",
           |              "payload_col": "text",
           |              "source_col": "source"}},
           |  {"op": "with_column",
           |   "params": {"name": "mime", "expr": "meta.mime"}},
           |  {"op": "with_column",
           |   "params": {"name": "source", "expr": "meta.source"}},
           |  {"op": "with_column",
           |   "params": {"name": "n_bytes", "expr": "meta.n_bytes"}},
           |  {"op": "select", "params": {"cols":
           |    ["id", "mime", "source", "n_bytes"]}}
           |]""".stripMargin)),

    // the audio dedup chain from config over the same WAV fixture
    // frame (Pipeline.fromJson over an in-flight asset frame — the
    // q_pipeline_cfg precedent) — q_multimodal_audiodup's oracle
    // verbatim
    "q_pipeline_audiodup" -> ((s, dir) =>
      graft.operators.Pipeline.fromJson(
        """[
          |  {"op": "audio_fingerprints",
          |   "params": {"frame_size": 32, "n_frames": 65}},
          |  {"op": "audio_near_dup",
          |   "params": {"hamming_max": 4, "chunks": 8}}
          |]""".stripMargin)(wavAssetsFixture(s, dir))),

    // the video dedup chain from config over the same AVI fixture
    // frame — q_multimodal_videodup's oracle verbatim
    "q_pipeline_videodup" -> ((s, dir) =>
      graft.operators.Pipeline.fromJson(
        """[
          |  {"op": "video_fingerprints",
          |   "params": {"stride": 1, "max_frames": 8}},
          |  {"op": "video_near_dup",
          |   "params": {"hamming_max": 4, "chunks": 8}}
          |]""".stripMargin)(aviAssetsFixture(s, dir))),

    // the curation chain under data CONTRACTS: expect_columns pins
    // the source schema, expect_condition asserts the gate invariant
    // in-plan, and an `include` splices the shared split+select tail
    // from a sibling file — all transparent when satisfied, so
    // q_pipeline_curate's oracle holds verbatim
    "q_pipeline_contract" -> ((s, dir) => {
      val tailCfg = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cfgtail_" + runTag(dir) + ".json")
      java.nio.file.Files.write(tailCfg.toPath,
        """[
          |  {"op": "split_by_hash",
          |   "params": {"weights": [["train", 90], ["val", 5],
          |                          ["test", 5]],
          |              "key_cols": ["doc_id"]}},
          |  {"op": "select",
          |   "params": {"cols": ["doc_id", "lang", "source",
          |                       "n_tokens", "split"]}}
          |]""".stripMargin.getBytes("UTF-8"))
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "expect_columns",
           |   "params": {"schema": "doc_id BIGINT, text STRING"}},
           |  {"op": "drop_exact_duplicates",
           |   "params": {"id_col": "doc_id", "text_col": "text"}},
           |  {"op": "token_count",
           |   "params": {"text_col": "text", "out_col": "n_tokens"}},
           |  {"op": "dup_ngram_fraction",
           |   "params": {"text_col": "text", "n": 2,
           |              "out_col": "dup2"}},
           |  {"op": "filter",
           |   "params": {"condition": "dup2 <= 0.05 AND n_tokens >= 30"}},
           |  {"op": "expect_condition",
           |   "params": {"condition": "n_tokens >= 30",
           |              "name": "token_floor_holds"}},
           |  {"op": "include",
           |   "params": {"path": "${tailCfg.getAbsolutePath}"}}
           |]""".stripMargin)
    }),

    // the HLL register family from pure JSON under q_stats_distinct's
    // oracle verbatim
    "q_pipeline_distinct" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "approx_distinct",
           |   "params": {"cols": ["lang", "source", "doc_id"]}}
           |]""".stripMargin)),

    // Welch's t-test from pure JSON: the statistical-test family's
    // config surface under q_stats_ttest's oracle verbatim
    "q_pipeline_ttest" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "welch_ttest",
           |   "params": {"value_col": "value",
           |              "group_col": "event_type",
           |              "group_a": "click", "group_b": "view"}}
           |]""".stripMargin)),

    // HITS from pure JSON: edge construction (with_column + select)
    // and the iterative operator both as config, under q_graph_hits's
    // oracle verbatim
    "q_pipeline_hits" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "with_column",
           |   "params": {"name": "src", "expr": "l_suppkey"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "l_partkey + 10000000L"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "hits",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "iters": 2}}
           |]""".stripMargin)),

    // the data-recipe mixing step from pure JSON — the step every
    // training recipe starts with — under q_sample_mixture's oracle
    // verbatim
    "q_pipeline_mixture" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "resample_to_mixture",
           |   "params": {"domain_col": "source",
           |              "weights": {"src0": 0.5, "src1": 0.3,
           |                          "src2": 0.2},
           |              "key_cols": ["doc_id"]}},
           |  {"op": "select",
           |   "params": {"cols": ["doc_id", "source", "lang"]}}
           |]""".stripMargin)),

    // leakage-safe splitting as config: the near-dup pair table
    // persists to parquet and the config names it by path (the
    // psi_drift convention) — q_sample_split_safe's oracle verbatim
    "q_pipeline_split_safe" -> ((s, dir) => {
      val pairsPath = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_cfgpairs_" + runTag(dir)).getPath
      val docs = t(s, dir, "documents")
      Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3,
          numHashes = 64, bands = 32, threshold = 0.5)
        .write.mode("overwrite").parquet(pairsPath)
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "split_by_cluster",
           |   "params": {"id_col": "doc_id",
           |              "pairs_path": "$pairsPath",
           |              "weights": [["train", 90], ["val", 5],
           |                          ["test", 5]]}},
           |  {"op": "select",
           |   "params": {"cols": ["doc_id", "source", "split"]}}
           |]""".stripMargin)
    }),

    // the events family's config surface: SCD2 validity intervals
    // from pure JSON under q_events_scd2's oracle verbatim
    "q_pipeline_scd2" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "scd2",
           |   "params": {"key_col": "user_id",
           |              "attr_col": "event_type"}}
           |]""".stripMargin)),

    // the reshape family's config surface: tidy long form from pure
    // JSON under q_reshape_melt's oracle verbatim
    "q_pipeline_melt" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "melt",
           |   "params": {"id_cols": ["l_orderkey", "l_linenumber"],
           |              "value_cols": ["l_quantity",
           |                "l_extendedprice", "l_discount", "l_tax"],
           |              "var_name": "measure",
           |              "val_name": "amount"}}
           |]""".stripMargin)),

    // the audited job runner: per-step row counts ride the sink's own
    // pass as CollectMetrics observations (zero extra scans) and the
    // report IS the query result — counts independently recomputable
    // by the oracle, so the audit itself is correctness-gated
    "q_pipeline_audit" -> ((s, dir) => {
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_audit_" + runTag(dir)).getPath
      graft.operators.Pipeline.runJobJsonAudited(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "token_count",
           |   "params": {"text_col": "text", "out_col": "n_tokens"}},
           |  {"op": "filter",
           |   "params": {"condition": "n_tokens >= 30"}},
           |  {"op": "select", "params": {"cols": ["doc_id"]}},
           |  {"op": "write_parquet", "params": {"path": "$out"}}
           |]""".stripMargin)
    }),

    // five more config replays, each compiling to its hand-written
    // twin's exact operator chain: retention / transition matrix
    // (events family), cap_per_group / token budget (sampling
    // family), and the grouping-sets cube
    "q_pipeline_retention" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "retention_cohorts",
           |   "params": {"period_seconds": 86400}}
           |]""".stripMargin)),

    "q_pipeline_transitions" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "transition_matrix", "params": {}}
           |]""".stripMargin)),

    "q_pipeline_cap" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "select",
           |   "params": {"cols": ["doc_id", "lang", "source"]}},
           |  {"op": "cap_per_group",
           |   "params": {"group_cols": ["source"], "n": 50,
           |              "key_cols": ["doc_id"]}}
           |]""".stripMargin)),

    "q_pipeline_budget" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "select_by_token_budget",
           |   "params": {"budget_tokens": 2000,
           |              "domain_cols": ["lang"],
           |              "quality": "n_chars", "id_col": "doc_id",
           |              "tokens": "size(split(text, ' '))"}},
           |  {"op": "select",
           |   "params": {"cols": ["doc_id", "lang", "cum_tokens"]}}
           |]""".stripMargin)),

    "q_pipeline_cube" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "cube",
           |   "params": {"group_cols": ["l_returnflag", "l_linestatus"],
           |              "aggs": [
           |      "cast(grouping(l_returnflag) as int) as g_rf",
           |      "cast(grouping(l_linestatus) as int) as g_ls",
           |      "count(1) as n",
           |      "cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty"]}}
           |]""".stripMargin)),

    // the crawl-politeness config surface: URL/priority/delay
    // construction and per-host frontier scheduling from pure JSON
    // under q_crawl_frontier's oracle verbatim
    "q_pipeline_frontier" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "with_column", "params": {"name": "host",
           |    "expr": "source || '.example.com'"}},
           |  {"op": "with_column", "params": {"name": "url",
           |    "expr": "'https://' || host || '/p/' || cast(doc_id as string)"}},
           |  {"op": "with_column", "params": {"name": "priority",
           |    "expr": "case when doc_id % 4 != 0 then cast(doc_id % 10 as double) / 10.0 end"}},
           |  {"op": "with_column", "params": {"name": "delay_ms",
           |    "expr": "case when cast(substring(source, 4, 10) as int) % 2 = 1 then cast(2000 as bigint) end"}},
           |  {"op": "select",
           |   "params": {"cols": ["host", "url", "priority",
           |                       "delay_ms"]}},
           |  {"op": "frontier_schedule",
           |   "params": {"priority_col": "priority",
           |              "delay_ms_col": "delay_ms",
           |              "default_delay_ms": 1000,
           |              "max_per_host": 15}}
           |]""".stripMargin)),

    // the in-flight dedup chain from pure JSON: LSH pairs contract to
    // connected components under q_dedup_clusters' oracle verbatim
    "q_pipeline_clusters" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "near_dup_pairs",
           |   "params": {"n": 3, "num_hashes": 64, "bands": 32,
           |              "threshold": 0.5}},
           |  {"op": "near_dup_clusters", "params": {}}
           |]""".stripMargin)),

    // the relational primitives from pure JSON: broadcast dimension
    // joins + grouped aggregate under q_join_revenue's oracle
    "q_pipeline_join" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "orders"}},
           |  {"op": "join_table",
           |   "params": {"path": "$dir/customer.parquet",
           |              "condition": "l.o_custkey = r.c_custkey",
           |              "broadcast": true}},
           |  {"op": "join_table",
           |   "params": {"path": "$dir/nation.parquet",
           |              "condition": "l.c_nationkey = r.n_nationkey",
           |              "broadcast": true}},
           |  {"op": "aggregate",
           |   "params": {"group_cols": ["n_name"],
           |              "aggs": [
           |      "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue",
           |      "count(1) as n_orders"]}}
           |]""".stripMargin)),

    // order_by + limit from config still plans TakeOrderedAndProject
    // (the steps compose adjacently) — q_sort_topk's oracle verbatim
    "q_pipeline_topk" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "order_by",
           |   "params": {"cols": ["l_extendedprice", "l_orderkey",
           |                       "l_linenumber"],
           |              "descending": [true, false, false]}},
           |  {"op": "limit", "params": {"n": 100}},
           |  {"op": "select", "params": {"cols":
           |    ["l_orderkey", "l_linenumber", "l_extendedprice"]}}
           |]""".stripMargin)),

    // the join-family config surface: the as-of self-join (purchase ←
    // latest prior click) from pure JSON under q_events_asof's oracle
    // verbatim — right_filter/right_renames express the same-table
    // self-join the hand-written twin builds in Scala
    "q_pipeline_asof" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "filter",
           |   "params": {"condition": "event_type = 'purchase'"}},
           |  {"op": "asof_join",
           |   "params": {"path": "$dir/events.parquet",
           |              "right_filter": "event_type = 'click'",
           |              "right_renames": [["event_id", "click_id"]],
           |              "key_col": "user_id", "ts_col": "ts",
           |              "left_cols": ["event_id"],
           |              "right_cols": ["click_id"]}},
           |  {"op": "select",
           |   "params": {"cols": ["user_id", "event_id", "click_id"]}}
           |]""".stripMargin)),

    // time-bin-bucketed range join from config — q_events_range's
    // oracle verbatim
    "q_pipeline_range" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "filter",
           |   "params": {"condition": "event_type = 'purchase'"}},
           |  {"op": "range_join",
           |   "params": {"path": "$dir/events.parquet",
           |              "right_filter": "event_type = 'click'",
           |              "right_renames": [["event_id", "click_id"]],
           |              "key_col": "user_id", "ts_col": "ts",
           |              "lower_seconds": 3600, "upper_seconds": 0,
           |              "left_cols": ["event_id"],
           |              "right_cols": ["click_id"]}},
           |  {"op": "select",
           |   "params": {"cols": ["user_id", "event_id", "click_id"]}}
           |]""".stripMargin)),

    // bloom-reduced fact filter + broadcast dim join from config —
    // q_join_bloom's oracle verbatim (bloom has no false negatives,
    // so the result equals the plain join row-for-row)
    "q_pipeline_bloom" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "orders"}},
           |  {"op": "select",
           |   "params": {"cols": ["o_custkey", "o_totalprice"]}},
           |  {"op": "bloom_join",
           |   "params": {"path": "$dir/customer.parquet",
           |              "right_filter": "c_mktsegment = 'BUILDING'",
           |              "fact_key": "o_custkey",
           |              "dim_key": "c_custkey"}},
           |  {"op": "join_table",
           |   "params": {"path": "$dir/nation.parquet",
           |              "condition": "l.c_nationkey = r.n_nationkey",
           |              "broadcast": true}},
           |  {"op": "aggregate",
           |   "params": {"group_cols": ["n_name"],
           |              "aggs": [
           |      "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue",
           |      "count(1) as n_orders"]}}
           |]""".stripMargin)),

    // skew-salted join from config: must equal the plain join —
    // q_join_revenue's oracle verbatim, like its hand-written twin
    "q_pipeline_salted" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "orders"}},
           |  {"op": "select",
           |   "params": {"cols": ["o_custkey", "o_totalprice"]}},
           |  {"op": "salted_join",
           |   "params": {"path": "$dir/customer.parquet",
           |              "right_renames": [["c_custkey", "o_custkey"]],
           |              "on": ["o_custkey"], "salt_factor": 8}},
           |  {"op": "join_table",
           |   "params": {"path": "$dir/nation.parquet",
           |              "condition": "l.c_nationkey = r.n_nationkey",
           |              "broadcast": true}},
           |  {"op": "aggregate",
           |   "params": {"group_cols": ["n_name"],
           |              "aggs": [
           |      "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue",
           |      "count(1) as n_orders"]}}
           |]""".stripMargin)),

    // the pre-join skew diagnostic from config — q_join_skewreport's
    // oracle verbatim
    "q_pipeline_skewreport" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "key_skew_report",
           |   "params": {"keys": ["l_suppkey"], "top_n": 10}}
           |]""".stripMargin)),

    // two-stage salted aggregation from config: the decimal value
    // column makes the re-associated sum exact, so the two-stage
    // result is hash-identical to the one-stage oracle
    "q_pipeline_salted_stats" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "with_column",
           |   "params": {"name": "qty",
           |              "expr": "cast(l_quantity as decimal(18,2))"}},
           |  {"op": "salted_stats",
           |   "params": {"keys": ["l_returnflag"], "value_col": "qty",
           |              "salt_factor": 8}},
           |  {"op": "with_column",
           |   "params": {"name": "sum", "expr": "cast(sum as double)"}},
           |  {"op": "with_column",
           |   "params": {"name": "min", "expr": "cast(min as double)"}},
           |  {"op": "with_column",
           |   "params": {"name": "max", "expr": "cast(max as double)"}}
           |]""".stripMargin)),

    // multi-source BFS from config: edges built by expression steps,
    // seeds a filter over the edge frame — q_graph_bfs's oracle
    // verbatim
    "q_pipeline_bfs" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "bfs_distances",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "seed_condition": "src % 17 = 0",
           |              "seed_col": "src", "max_hops": 3}}
           |]""".stripMargin)),

    // the FULL crawl-to-ranking chain from pure JSON: synthetic HTML →
    // extract_links (base-resolved) → host contraction → weighted
    // PageRank, under q_graph_pagerank_hosts' oracle verbatim — the
    // whole q_graph chain is now config-expressible end to end
    "q_pipeline_rank_hosts" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "with_column",
           |   "params": {"name": "html", "expr":
           |     "'<html><body><nav><a href=\\"/\\">Home</a> <a href=''/about/''>About&nbsp;Us</a></nav><p>see <a href=\\"../sibling.html\\">the <b>sibling</b></a> and <a href=\\"//cdn.example.net/lib.js\\">cdn</a> and <a href=\\"https://other.example.org/x?id=' || cast(doc_id as string) || '\\">doc link</a> and <a href=\\"#frag\\">skip</a> <a href=\\"mailto:x@y\\">skip too</a></p></body></html>'"}},
           |  {"op": "with_column",
           |   "params": {"name": "base", "expr":
           |     "'https://site' || cast(doc_id % 7 as string) || '.example.com/dir' || cast(doc_id % 5 as string) || '/page/index.html'"}},
           |  {"op": "select",
           |   "params": {"cols": ["doc_id", "html", "base"]}},
           |  {"op": "extract_links",
           |   "params": {"id_col": "doc_id", "html_col": "html",
           |              "base_url_col": "base"}},
           |  {"op": "with_column",
           |   "params": {"name": "src_url", "expr":
           |     "'https://site' || cast(doc_id % 7 as string) || '.example.com/dir' || cast(doc_id % 5 as string) || '/page/index.html'"}},
           |  {"op": "host_graph",
           |   "params": {"src_col": "src_url",
           |              "dst_url_col": "href_abs",
           |              "page_id_col": "doc_id"}},
           |  {"op": "pagerank_weighted",
           |   "params": {"src_col": "src_host", "dst_col": "dst_host",
           |              "weight_col": "n_links", "iters": 3}}
           |]""".stripMargin)),

    // the domain contraction with a LOADED suffix list from config:
    // psl_path points at a publicsuffix.org-format file (written
    // fresh each run — wildcard, exception, private-domain rules),
    // exercising host_graph's full-PSL param end to end under
    // q_graph_domaingraph_psl's oracle verbatim
    "q_pipeline_domaingraph_psl" -> ((s, dir) => {
      val rules = pslRulesFile
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "with_column",
           |   "params": {"name": "html", "expr":
           |     "'<html><body><nav><a href=\\"/\\">Home</a> <a href=''/about/''>About&nbsp;Us</a></nav><p>see <a href=\\"../sibling.html\\">the <b>sibling</b></a> and <a href=\\"//cdn.example.net/lib.js\\">cdn</a> and <a href=\\"https://other.example.org/x?id=' || cast(doc_id as string) || '\\">doc link</a> and <a href=\\"#frag\\">skip</a> <a href=\\"mailto:x@y\\">skip too</a></p></body></html>'"}},
           |  {"op": "with_column",
           |   "params": {"name": "base", "expr":
           |     "'https://site' || cast(doc_id % 7 as string) || '.example.com/dir' || cast(doc_id % 5 as string) || '/page/index.html'"}},
           |  {"op": "select",
           |   "params": {"cols": ["doc_id", "html", "base"]}},
           |  {"op": "extract_links",
           |   "params": {"id_col": "doc_id", "html_col": "html",
           |              "base_url_col": "base"}},
           |  {"op": "with_column",
           |   "params": {"name": "src_url", "expr":
           |     "'https://site' || cast(doc_id % 7 as string) || '.example.com/dir' || cast(doc_id % 5 as string) || '/page/index.html'"}},
           |  {"op": "host_graph",
           |   "params": {"src_col": "src_url",
           |              "dst_url_col": "href_abs",
           |              "page_id_col": "doc_id",
           |              "to_domain": true,
           |              "psl_path": "$rules"}}
           |]""".stripMargin)
    }),

    // the streaming first-seen tagger's BATCH face from config:
    // global (ts, event_id)-order first-per-key flags — the same
    // step that tags arrival-order duplicates on a stream (and,
    // composed with expect_condition + quarantine_path, quarantines
    // them); oracled by row_number = 1
    "q_pipeline_firstseen" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "first_seen_flags_watermarked",
           |   "params": {"keys": ["user_id", "event_type"],
           |              "watermark_delay": "10 seconds",
           |              "order_cols": ["ts", "event_id"]}},
           |  {"op": "select",
           |   "params": {"cols": ["event_id", "user_id",
           |                       "event_type", "is_first"]}}
           |]""".stripMargin)),

    // the remaining graph family from config, each replaying its
    // hand-written twin's oracle verbatim over the SAME co-order
    // graph built by config steps (filter → distinct → join_table
    // self-join against the raw parquet path)
    "q_pipeline_triangles" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s, coOrderCfg(dir,
        """{"op": "triangle_counts",
          |   "params": {"src_col": "src", "dst_col": "dst"}}"""
          .stripMargin))),

    "q_pipeline_kcore" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s, coOrderCfg(dir,
        """{"op": "k_core",
          |   "params": {"src_col": "src", "dst_col": "dst",
          |              "k": 15}}""".stripMargin))),

    "q_pipeline_lpa" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s, coOrderCfg(dir,
        """{"op": "label_propagation",
          |   "params": {"src_col": "src", "dst_col": "dst",
          |              "iters": 3}}""".stripMargin))),

    "q_pipeline_assort" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s, coOrderCfg(dir,
        """{"op": "assortativity",
          |   "params": {"src_col": "src", "dst_col": "dst"}}"""
          .stripMargin))),

    // the last four cells of the step-vs-operator equivalence
    // matrix: pagerank / personalized pagerank / connected
    // components / adamic-adar from config, each replaying its
    // hand-written twin's oracle verbatim — every iterative graph
    // operator is now config-reachable and oracle-equal
    "q_pipeline_pagerank" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "with_column",
           |   "params": {"name": "src", "expr": "l_suppkey"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "l_partkey + 10000000"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "pagerank",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "iters": 3}}
           |]""".stripMargin)),

    // the seed slice rides as a compile-parsed seed_condition over
    // the edge frame (SF-independent — a literal id list would pin
    // the config to one scale factor)
    "q_pipeline_ppr" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "with_column",
           |   "params": {"name": "src", "expr": "l_suppkey"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "l_partkey + 10000000"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "personalized_pagerank",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "seed_condition": "src % 17 = 0",
           |              "iters": 3}}
           |]""".stripMargin)),

    // the temporal co-presence edge build (lag window + gap filter)
    // is config-expressible via with_column's OVER surface
    "q_pipeline_components" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "events"}},
           |  {"op": "with_column",
           |   "params": {"name": "prev_id",
           |              "expr": "lag(event_id, 1) over (partition by event_type order by ts, event_id)"}},
           |  {"op": "with_column",
           |   "params": {"name": "gap",
           |              "expr": "unix_micros(ts) - unix_micros(lag(ts, 1) over (partition by event_type order by ts, event_id))"}},
           |  {"op": "filter",
           |   "params": {"condition": "prev_id is not null and gap <= 1800000000"}},
           |  {"op": "select", "params": {"cols": ["prev_id", "event_id"]}},
           |  {"op": "connected_components",
           |   "params": {"src_col": "prev_id", "dst_col": "event_id"}}
           |]""".stripMargin)),

    "q_pipeline_adamic" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "with_column",
           |   "params": {"name": "src", "expr": "l_suppkey"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "l_partkey + 10000000"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "adamic_adar",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "top_n": 20, "max_degree": 64}}
           |]""".stripMargin)),

    // schema conformance from config: declared order, a real cast
    // (n_chars bigint → double), a typed NULL fill for the missing
    // column, undeclared columns dropped
    "q_pipeline_conform" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "documents"}},
           |  {"op": "conform_schema",
           |   "params": {"schema":
           |     "doc_id BIGINT, lang STRING, n_chars DOUBLE, quality_tier INT"}}
           |]""".stripMargin)),

    // window functions from config: with_column's compile-parsed
    // expression surface accepts OVER clauses, so per-key ranks /
    // lags / rolling frames need no dedicated step — q_window_topn's
    // oracle verbatim
    "q_pipeline_topn" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "orders"}},
           |  {"op": "with_column",
           |   "params": {"name": "rn",
           |              "expr": "row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey)"}},
           |  {"op": "filter", "params": {"condition": "rn <= 3"}},
           |  {"op": "select",
           |   "params": {"cols": ["o_custkey", "rn", "o_orderkey",
           |                       "o_totalprice"]}}
           |]""".stripMargin)),

    // HyperBall centrality from config — q_graph_harmonic's oracle
    // verbatim
    "q_pipeline_harmonic" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 40"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "harmonic_centrality",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "iters": 3, "b": 4}}
           |]""".stripMargin)),

    // hash-seeded walk generation from config — q_graph_walks'
    // oracle verbatim
    "q_pipeline_walks" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42"}}
           |]""".stripMargin)),

    // the seeded bucketed form from config (start_condition selects
    // the walk starts from the edge frame) — q_graph_walks_seeded's
    // oracle verbatim
    "q_pipeline_walks_seeded" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42",
           |              "start_condition": "src % 17 = 0",
           |              "bucket_cap": 8}}
           |]""".stripMargin)),

    // walk corpus → skip-gram pairs, end to end from config —
    // q_graph_walk_pairs' oracle verbatim
    "q_pipeline_walk_pairs" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42"}},
           |  {"op": "walk_pairs", "params": {"window": 2}}
           |]""".stripMargin)),

    // the COMPLETE training pipeline from config: seeded walks →
    // pairs → labeled examples (positives + hash negatives) →
    // embedding training — q_graph_embeddings' oracle verbatim
    "q_pipeline_embeddings" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42",
           |              "start_condition": "src % 17 = 0",
           |              "bucket_cap": 8}},
           |  {"op": "walk_pairs", "params": {"window": 2}},
           |  {"op": "walk_examples", "params": {"k": 2, "seed": "n7"}},
           |  {"op": "train_node_embeddings",
           |   "params": {"dim": 4, "iters": 2, "lr": 0.5,
           |              "seed": "e0"}}
           |]""".stripMargin)),

    // the convergence readout from config — the same chain, loss
    // instead of weights; q_graph_embed_loss's oracle verbatim
    "q_pipeline_embed_loss" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42",
           |              "start_condition": "src % 17 = 0",
           |              "bucket_cap": 8}},
           |  {"op": "walk_pairs", "params": {"window": 2}},
           |  {"op": "walk_examples", "params": {"k": 2, "seed": "n7"}},
           |  {"op": "train_node_embeddings_loss",
           |   "params": {"dim": 4, "iters": 2, "lr": 0.5,
           |              "seed": "e0"}}
           |]""".stripMargin)),

    // train-then-SERVE from config: the trained embedding matrix
    // assembles into dense vectors and the existing exact-cosine
    // operator reads out each node's nearest neighbors in the
    // learned space — the full node2vec lifecycle as one config
    "q_pipeline_embed_knn" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42",
           |              "start_condition": "src % 17 = 0",
           |              "bucket_cap": 8}},
           |  {"op": "walk_pairs", "params": {"window": 2}},
           |  {"op": "walk_examples", "params": {"k": 2, "seed": "n7"}},
           |  {"op": "train_node_embeddings",
           |   "params": {"dim": 4, "iters": 2, "lr": 0.5,
           |              "seed": "e0"}},
           |  {"op": "assemble_vectors",
           |   "params": {"id_col": "node", "index_col": "j",
           |              "value_col": "e_w"}},
           |  {"op": "cosine_topk",
           |   "params": {"k": 3, "id_col": "node"}}
           |]""".stripMargin)),

    // node2vec from config — q_graph_node2vec's oracle verbatim
    "q_pipeline_node2vec" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "node2vec_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "p": 1, "q": 4, "seed": "s42"}}
           |]""".stripMargin)),

    // seeded second-order walks from config (start_condition picks
    // the frontier) — q_graph_node2vec_seeded's oracle verbatim
    "q_pipeline_node2vec_seeded" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "node2vec_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "p": 1, "q": 4, "seed": "s42",
           |              "start_condition": "src % 17 = 0",
           |              "bucket_cap": 8}}
           |]""".stripMargin)),

    // the full walk → pairs → negatives training-data chain from
    // config — q_graph_walk_negatives' oracle verbatim
    "q_pipeline_walk_negatives" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "random_walks",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "steps": 3, "seed": "s42"}},
           |  {"op": "walk_pairs", "params": {"window": 2}},
           |  {"op": "walk_negatives",
           |   "params": {"k": 2, "seed": "n7"}}
           |]""".stripMargin)),

    // weighted shortest paths from config: the in-flight frame is the
    // edge list, seeds a compile-parsed filter over it —
    // q_graph_sssp's oracle verbatim
    "q_pipeline_sssp" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 45"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "w", "expr": "l_quantity"}},
           |  {"op": "select", "params": {"cols": ["src", "dst", "w"]}},
           |  {"op": "shortest_paths",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "weight_col": "w",
           |              "seed_condition": "src % 17 = 0",
           |              "seed_col": "src", "max_hops": 2}}
           |]""".stripMargin)),

    // HyperBall closeness from config — q_graph_closeness' oracle
    // verbatim
    "q_pipeline_closeness" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 40"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "closeness_centrality",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "iters": 3, "b": 4}}
           |]""".stripMargin)),

    // the global HyperBall report from config — q_graph_nf's oracle
    // verbatim
    "q_pipeline_nf" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "lineitem"}},
           |  {"op": "filter", "params": {"condition": "l_quantity > 40"}},
           |  {"op": "with_column",
           |   "params": {"name": "src",
           |              "expr": "cast(l_suppkey as bigint)"}},
           |  {"op": "with_column",
           |   "params": {"name": "dst",
           |              "expr": "cast(l_partkey + 10000000 as bigint)"}},
           |  {"op": "select", "params": {"cols": ["src", "dst"]}},
           |  {"op": "neighborhood_function",
           |   "params": {"src_col": "src", "dst_col": "dst",
           |              "iters": 3, "b": 4}}
           |]""".stripMargin)),

    // the PARITY CORE through the step registry: by-name rewrites
    // compile through Functioniser.fromConfig to the same single
    // select — q_fn_root's oracle verbatim (its closure `lower` is
    // the builtin by the same name)
    "q_pipeline_fns" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "customer"}},
           |  {"op": "apply_functions",
           |   "params": {"fields": [["c_name", "upper"],
           |                         ["c_mktsegment", "lower"]]}}
           |]""".stripMargin)),

    // the set-op family from config: UNION (union_table + distinct)
    // then EXCEPT against a filtered, reshaped loaded side —
    // q_set_ops' oracle verbatim
    "q_pipeline_setops" -> ((s, dir) =>
      graft.operators.Pipeline.runJson(s,
        s"""[
           |  {"op": "read_table", "params": {"dir": "$dir",
           |    "table": "customer"}},
           |  {"op": "with_column",
           |   "params": {"name": "nationkey", "expr": "c_nationkey"}},
           |  {"op": "select", "params": {"cols": ["nationkey"]}},
           |  {"op": "union_table",
           |   "params": {"path": "$dir/supplier.parquet",
           |              "right_exprs": ["s_nationkey as nationkey"]}},
           |  {"op": "distinct", "params": {}},
           |  {"op": "except_table",
           |   "params": {"path": "$dir/nation.parquet",
           |              "right_filter": "n_regionkey = 0",
           |              "right_exprs":
           |      ["cast(n_nationkey as int) as nationkey"]}}
           |]""".stripMargin)),

    // global top-K via sort + limit (TakeOrderedAndProject — no full sort)
    "q_sort_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),

    // per-key top-N via window rank
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
    })
  )

  /** DuckDB-runnable oracle SQL per query (same parquet tables, same
    * column aliases). Omitted: q_sim_ivf only (its Lloyd-refined
    * centroids depend on float aggregation order, which no external
    * engine can replicate — covered by a recall spec plus the
    * provably-exact degenerate gates instead). */
  def oracleSql: Map[String, String] = {
    // shared DuckDB fragments (DuckDB 1.0: list comprehensions, list_*)
    // exhaustive-Jaccard pair table, parameterized on the pair join
    // predicate so the one-corpus and incremental gates share ONE
    // definition of shingling and the jaccard math
    def shingleCteOn(joinOn: String) =
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), sh AS (
         |  SELECT doc_id,
         |         CASE WHEN len(w) >= 3 THEN list_distinct(
         |           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
         |            FOR i IN range(1, greatest(len(w)-1, 1))])
         |         ELSE [] END AS s
         |  FROM toks
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         len(list_intersect(a.s, b.s)) AS n_common,
         |         len(a.s) AS sa, len(b.s) AS sb
         |  FROM sh a JOIN sh b ON $joinOn
         |  WHERE len(a.s) > 0 AND len(b.s) > 0
         |)
         |SELECT id_a, id_b,
         |       round(n_common::DOUBLE / (sa + sb - n_common), 6) AS jaccard
         |FROM pairs
         |WHERE n_common::DOUBLE / (sa + sb - n_common) >= 0.5""".stripMargin
    val shingleCte = shingleCteOn("a.doc_id < b.doc_id")
    // 48-bit integer split bucketing + named-split CASE — shared by the
    // standalone split gate and the composed pipeline gate
    val splitBucketSql =
      "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT" +
        " * 100) >> 48"
    val splitCaseSql =
      """CASE WHEN b < 90 THEN 'train'
        |       WHEN b < 95 THEN 'val'
        |       ELSE 'test' END AS split""".stripMargin
    // duplicated-bigram fraction over a token list column `w` — shared
    // by the repetition gate and the pipeline quality gate
    val dupBigramSql =
      """(CASE WHEN len(w) - 1 >= 1 THEN
        |    round(1 - len(list_distinct(
        |      [array_to_string(w[i:(i+1)], ' ') FOR i IN range(1, len(w))]
        |      ))::DOUBLE / (len(w) - 1), 6) ELSE 0.0 END)""".stripMargin

    // the Morton key as generated SQL: bit i of l_partkey -> position
    // 2i, of l_suppkey -> 2i+1 — the exact Layout.zValue interleave
    val zorderExprSql = (0 until 16).flatMap(i => Seq(
      s"(((l_partkey >> $i) & 1) << ${2 * i})",
      s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

    // q_sim_ann oracle: the hyperplane constants are DETERMINISTIC
    // (seed 42), so they interpolate into the SQL as literal arrays —
    // the same programmatic-oracle trick as the Morton key above. The
    // oracle replicates the ALGORITHM (sign buckets, Hamming-1
    // multi-probe, cosine re-rank), not just its recall.
    // q_text_extract interpolants, derived from the operator's own
    // constants so SQL and engine can't drift
    val HtmlBlockTagsSql = graft.operators.HtmlExtract.BlockTags
    val HtmlStopwordsSql = graft.operators.HtmlExtract.DefaultStopwords
      .map(w => s"'$w'").mkString(",")

    // q_url_canon interpolants, derived from the operator's constants
    val urlTrackingSql = graft.operators.UrlOps.TrackingParams
      .map(w => s"'$w'").mkString(",")
    val urlSuffixesSql = graft.operators.UrlOps.MultiLabelSuffixes
      .map(w => s"'$w'").mkString(",")

    // q_url_sitemap: one tag's field extraction exactly as
    // Sitemaps.field does it — regexp group, CDATA strip, trim, the
    // entity chain generated from the operator's own table, empty->null
    def sitemapFieldSql(block: String, tag: String): String = {
      val raw = s"regexp_extract($block, '(?s)<$tag>(.*?)</$tag>', 1)"
      val noCdata = s"regexp_replace($raw, " +
        "'(?s)^\\s*<!\\[CDATA\\[(.*)\\]\\]>\\s*" + "$', '\\1')"
      val decoded = graft.operators.Sitemaps.XmlEntities
        .foldLeft(s"trim($noCdata)") { case (acc, (pat, rep)) =>
          s"replace($acc, '$pat', '${rep.replace("'", "''")}')"
        }
      s"nullif($decoded, '')"
    }

    // q_text_normalize: the mojibake repair table as a nested DuckDB
    // replace() chain, every char spelled chr(codepoint) so the SQL
    // stays ASCII and cannot drift from Normalize.MojibakeRepairs
    def chrSql(s: String): String =
      s.map(c => s"chr(${c.toInt})").mkString(" || ")
    val mojibakeRepairedSql = graft.operators.Normalize.MojibakeRepairs
      .foldLeft("t0") { case (acc, (pat, rep)) =>
        s"replace($acc, ${chrSql(pat)}, ${chrSql(rep)})"
      }

    // q_text_sentences / q_text_readability: the protect->mark->split
    // chain as generated SQL from Sentences' own constants, so SQL and
    // engine cannot drift. Markers enter via chr(1)/chr(30) expressions
    // (replace() args and regexp_replace replacements are expressions,
    // so '\1' || chr(1) concatenates before backref substitution) —
    // the SQL text itself stays ASCII.
    def sentMarkedSql(in: String): String = {
      val abbr = graft.operators.Sentences.Abbreviations
        .foldLeft(in) { (acc, a) =>
          s"replace($acc, '$a.', '$a' || chr(1))"
        }
      val dec1 = s"regexp_replace($abbr, '([0-9])\\.([0-9])', " +
        "'\\1' || chr(1) || '\\2', 'g')"
      val dec2 = s"regexp_replace($dec1, '([0-9])\\.([0-9])', " +
        "'\\1' || chr(1) || '\\2', 'g')"
      s"regexp_replace($dec2, '([.!?]+)[ \\t\\n\\r]+', " +
        "'\\1' || chr(30), 'g')"
    }
    def sentArraySql(in: String): String =
      s"list_filter(list_transform(string_split(${sentMarkedSql(in)}, " +
        "chr(30)), p -> trim(replace(p, chr(1), '.'))), p -> p <> '')"

    val annPlanesSql = graft.operators.Similarity.hyperplanes(6, 64, 42L)
      .zipWithIndex.map { case (h, p) =>
        s"($p, [${h.mkString(", ")}])"
      }.mkString(",\n          |    ")

    // the q_sim_reduce projection matrix, same literal-interpolation
    // discipline as the ANN hyperplanes
    val jlPlanesSql = graft.operators.Similarity.hyperplanes(16, 64, 42L)
      .zipWithIndex.map { case (h, p) =>
        s"($p, [${h.mkString(", ")}])"
      }.mkString(",\n          |    ")

    // PQ ADC cosine top-5: lowest-id codebook init, per-subspace argmax
    // encoding (score desc, cid desc — mirrors NearestCentroid), ADC
    // cosine with pinned fold orders (list_reduce == the kernel's
    // left-to-right accumulation). Oracle for the brute-force PQ entry
    // AND the persisted IVF-PQ index probed at nprobe = nlist (provably
    // the same search)
    val pqTopKSql =
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), cb AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS ce
        |  FROM v ORDER BY vec_id LIMIT 16
        |), cbl AS (
        |  SELECT list(ce ORDER BY cid) AS cbs FROM cb
        |), codes AS (
        |  SELECT vec_id, list(cid ORDER BY j) AS code FROM (
        |    SELECT vec_id, j, cid FROM (
        |      SELECT v.vec_id, t.j AS j, cb.cid,
        |        row_number() OVER (PARTITION BY v.vec_id, t.j ORDER BY
        |          list_dot_product(v.e[(t.j*8+1):((t.j+1)*8)],
        |                           cb.ce[(t.j*8+1):((t.j+1)*8)])
        |          - list_dot_product(cb.ce[(t.j*8+1):((t.j+1)*8)],
        |                             cb.ce[(t.j*8+1):((t.j+1)*8)]) / 2
        |          DESC, cb.cid DESC) AS rn
        |      FROM v, range(8) t(j), cb
        |      WHERE list_dot_product(v.e, v.e) > 0)
        |    WHERE rn = 1)
        |  GROUP BY vec_id
        |), scored AS (
        |  SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id,
        |    list_reduce(
        |      [list_dot_product(q.e[(j*8+1):((j+1)*8)],
        |         cbl.cbs[cd.code[j+1]+1][(j*8+1):((j+1)*8)])
        |       FOR j IN range(8)], (a, b) -> a + b)
        |    / (sqrt(list_dot_product(q.e, q.e)) *
        |       sqrt(list_reduce(
        |         [list_dot_product(cbl.cbs[cd.code[j+1]+1][(j*8+1):((j+1)*8)],
        |            cbl.cbs[cd.code[j+1]+1][(j*8+1):((j+1)*8)])
        |          FOR j IN range(8)], (a, b) -> a + b))) AS cos_raw
        |  FROM v q, codes cd, cbl
        |  WHERE q.vec_id < 10 AND q.vec_id <> cd.vec_id
        |    AND list_dot_product(q.e, q.e) > 0
        |), ranked AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank,
        |    round(cos_raw, 6) AS cosine
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, cosine
        |FROM ranked WHERE rank <= 5""".stripMargin

    // exact cosine top-5 for the ten query vectors — the oracle for the
    // brute-force entry AND every ANN entry run at its provably-exact
    // degenerate parameterization (numPlanes=0 / nprobe=nlist)
    // Unrolled greedy MMR replica of [[Similarity.mmrRerank]] over the
    // exact top-`topN` candidates of queries vec_id < 10: round r picks
    // each query's argmax of λ·score − (1−λ)·maxsim (unrounded, ties →
    // lowest id), then the remaining frame folds the pick into the
    // running max-sim with the same greatest() shape. `lambda` is
    // spliced as a literal so both engines derive (1 − λ) identically.
    def mmrOracleSql(k: Int, topN: Int, lambda: String): String = {
      // the pick-similarity uses the EXPLICIT dot/(norm·norm) shape —
      // the same primitive order as cosineWithNorms over precomputed
      // l2Norms — because an mmr landing on a round-6 boundary is
      // sensitive to the last bit, where list_cosine_similarity's
      // internal shape can differ
      val head =
        s"""WITH cand AS MATERIALIZED (
           |  SELECT query_id, neighbor_id, round(cos_raw, 6) AS score,
           |         emb, sqrt(list_dot_product(emb, emb)) AS nrm,
           |         0.0 AS maxsim
           |  FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
           |        CAST(c.embedding AS DOUBLE[])) AS cos_raw,
           |      CAST(c.embedding AS DOUBLE[]) AS emb
           |    FROM embeddings q JOIN embeddings c ON q.vec_id < 10
           |      AND q.vec_id <> c.vec_id)
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos_raw DESC, neighbor_id) <= $topN
           |)""".stripMargin
      val rounds = (1 to k).map { r =>
        val prev = if (r == 1) "cand" else s"rem${r - 1}"
        val sel =
          s"""sel$r AS MATERIALIZED (
             |  SELECT query_id, neighbor_id, emb, nrm,
             |    $lambda * score - (1 - $lambda) * maxsim AS mmr
             |  FROM $prev
             |  QUALIFY row_number() OVER (PARTITION BY query_id
             |    ORDER BY mmr DESC, neighbor_id) = 1
             |)""".stripMargin
        val rem = if (r == k) "" else
          s""",
             |rem$r AS MATERIALIZED (
             |  SELECT c.query_id, c.neighbor_id, c.score, c.emb, c.nrm,
             |    greatest(c.maxsim,
             |      list_dot_product(c.emb, s.emb) / (c.nrm * s.nrm))
             |      AS maxsim
             |  FROM $prev c JOIN sel$r s USING (query_id)
             |  WHERE c.neighbor_id <> s.neighbor_id
             |)""".stripMargin
        sel + rem
      }.mkString(",\n")
      // integer-scale rounding: agrees with Spark's round even when the
      // value lands on a half boundary (see mmrRerank)
      val finals = (1 to k).map(r =>
        s"SELECT query_id, $r AS sel_rank, neighbor_id, " +
          s"round(mmr * 1000000.0) / 1000000.0 AS mmr FROM sel$r")
        .mkString("\nUNION ALL\n")
      s"$head,\n$rounds\n$finals"
    }

    // Kneser-Ney held-out scoring, mirrored exactly (shared by the
    // plain score entry and the perplexity-bucket composition)
    val knOracleSql =
        """WITH train AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
          |), held AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
          |), tbg AS (
          |  SELECT w[i] AS w1, w[i+1] AS w2
          |  FROM (SELECT string_split(text, ' ') AS w FROM train),
          |       LATERAL (SELECT unnest(range(1, len(w))) AS i)
          |), lm AS (
          |  SELECT w1, w2, count(*)::BIGINT AS n FROM tbg GROUP BY 1, 2
          |), ctx AS (
          |  SELECT w1, sum(n)::BIGINT AS ctx FROM lm GROUP BY 1
          |), n1f AS (
          |  SELECT w1, count(*)::BIGINT AS n1f FROM lm GROUP BY 1
          |), cont AS (
          |  SELECT w2, count(*)::BIGINT AS cont FROM lm GROUP BY 1
          |), tv AS (
          |  SELECT (SELECT count(*) FROM lm)::DOUBLE AS t,
          |         (SELECT count(DISTINCT w) FROM (
          |            SELECT w1 AS w FROM lm
          |            UNION SELECT w2 FROM lm))::DOUBLE AS nv
          |), hbg AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM held),
          |       LATERAL (SELECT unnest(range(1, len(w))) AS i)
          |), scored AS (
          |  SELECT hbg.doc_id,
          |    CAST(round(ln(
          |      CASE WHEN ctx.ctx IS NOT NULL THEN
          |        (greatest(COALESCE(lm.n, 0)::DOUBLE - 0.75::DOUBLE,
          |                  0::DOUBLE)
          |         + 0.75::DOUBLE * n1f.n1f::DOUBLE *
          |           ((COALESCE(cont.cont, 0)::DOUBLE + 0.5::DOUBLE)
          |            / (tv.t + 0.5::DOUBLE * (tv.nv + 1::DOUBLE))))
          |        / ctx.ctx::DOUBLE
          |      ELSE
          |        ((COALESCE(cont.cont, 0)::DOUBLE + 0.5::DOUBLE)
          |         / (tv.t + 0.5::DOUBLE * (tv.nv + 1::DOUBLE)))
          |      END), 9) AS DECIMAL(28,9)) AS logp
          |  FROM hbg LEFT JOIN lm USING (w1, w2)
          |           LEFT JOIN ctx USING (w1)
          |           LEFT JOIN n1f USING (w1)
          |           LEFT JOIN cont USING (w2), tv
          |)
          |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
          |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS avg_logprob
          |FROM scored GROUP BY 1""".stripMargin

    // Order-N interpolated Kneser-Ney, generated for any order 2..5:
    // raw counts at the top order, CONTINUATION type-counts through
    // the backoff chain, the add-half unigram floor; probabilities
    // built bottom-up in staged CTEs so every double op runs in the
    // same order as the Spark fold. The hand-written order-3 SQL
    // below serves as the generator's semantic pin (both gate green
    // on identical output).
    def knNOracleSql(n: Int): String = {
      require(n >= 3 && n <= 5, "generator covers orders 3..5")
      // per-order type/count tables from the train slide: t{k} has
      // columns w1..wk (+ n on the top order)
      val typeCtes = (2 to n).map { k =>
        val cols = (1 to k).map(j => s"w[i+${j - 1}] AS w$j")
          .mkString(", ")
        val cnt = if (k == n) ", count(*)::BIGINT AS n" else ""
        val grp = (1 to k).mkString(", ")
        s"""t$k AS (
           |  SELECT ${cols}$cnt
           |  FROM train, LATERAL (SELECT unnest(range(1,
           |    len(w) - ${k - 2})) AS i)
           |  GROUP BY $grp
           |)""".stripMargin
      }.mkString(", ")
      val topKey = (1 until n).map(j => s"w$j").mkString(", ")
      val topCte =
        s"""tc AS (
           |  SELECT $topKey, sum(n)::BIGINT AS ctxn,
           |    count(*)::BIGINT AS n1pn
           |  FROM t$n GROUP BY ${(1 until n).mkString(", ")}
           |)""".stripMargin
      // mid orders k = 2..n-1: continuation tables from t{k+1} types,
      // interpolation weight from t{k} types — group-keys aliased to
      // the DOC POSITIONS they join on (last k / k-1 gram slots)
      val midCtes = (2 until n).map { k =>
        val cnKey = (2 to k + 1).zipWithIndex
          .map { case (j, x) => s"w$j AS w${n - k + 1 + x}" }
          .mkString(", ")
        val ccKey = (2 to k).zipWithIndex
          .map { case (j, x) => s"w$j AS w${n - k + 1 + x}" }
          .mkString(", ")
        val npKey = (1 until k).zipWithIndex
          .map { case (j, x) => s"w$j AS w${n - k + 1 + x}" }
          .mkString(", ")
        s"""cn$k AS (
           |  SELECT $cnKey, count(*)::BIGINT AS cnv$k
           |  FROM t${k + 1} GROUP BY ${(1 to k).mkString(", ")}
           |), cc$k AS (
           |  SELECT $ccKey, count(*)::BIGINT AS ccv$k
           |  FROM t${k + 1} GROUP BY ${(1 until k).mkString(", ")}
           |), np$k AS (
           |  SELECT $npKey, count(*)::BIGINT AS npv$k
           |  FROM t$k GROUP BY ${(1 until k).mkString(", ")}
           |)""".stripMargin
      }.mkString(", ")
      val hgCols = (1 to n).map(j => s"w[i+${j - 1}] AS w$j")
        .mkString(", ")
      // joins: top count + top ctx + per-k mid tables + unigram floor
      val midJoins = (2 until n).map { k =>
        val cnU = (n - k + 1 to n).map(j => s"w$j").mkString(", ")
        val ccU = (n - k + 1 until n).map(j => s"w$j").mkString(", ")
        s"""          LEFT JOIN cn$k USING ($cnU)
           |          LEFT JOIN cc$k USING ($ccU)
           |          LEFT JOIN np$k USING ($ccU)""".stripMargin
      }.mkString("\n")
      // staged probability CTEs: p1 in sc1, then one stage per order
      val pStages = (2 until n).map { k =>
        val keep = (Seq("nn", "ctxn", "n1pn") ++
          (k + 1 until n).flatMap(j => Seq(s"cnv$j", s"ccv$j",
            s"npv$j"))).mkString(", ")
        s""", sc$k AS (
           |  SELECT doc_id, $keep,
           |    CASE WHEN ccv$k IS NOT NULL THEN
           |      (greatest(COALESCE(cnv$k, 0)::DOUBLE - 0.75::DOUBLE,
           |                0::DOUBLE)
           |       + 0.75::DOUBLE * COALESCE(npv$k, 0)::DOUBLE
           |         * p${k - 1}) / ccv$k::DOUBLE
           |    ELSE p${k - 1} END AS p$k
           |  FROM sc${k - 1}
           |)""".stripMargin
      }.mkString
      s"""WITH train AS (
         |  SELECT string_split(text, ' ') AS w FROM documents
         |  WHERE doc_id % 10 <> 0
         |), held AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE doc_id % 10 = 0
         |), $typeCtes, $topCte, $midCtes, cu AS (
         |  SELECT w2 AS w$n, count(*)::BIGINT AS cont FROM t2
         |  GROUP BY 1
         |), tv AS (
         |  SELECT (SELECT count(*) FROM t2)::DOUBLE AS t,
         |         (SELECT count(DISTINCT tok) FROM (
         |            SELECT unnest(w) AS tok FROM train))::DOUBLE AS nv
         |), hg AS (
         |  SELECT doc_id, $hgCols
         |  FROM held, LATERAL (SELECT unnest(range(1,
         |    len(w) - ${n - 2})) AS i)
         |), sc1 AS (
         |  SELECT hg.doc_id, t$n.n AS nn, tc.ctxn, tc.n1pn${
            if (n > 2) ", " + (2 until n).flatMap(k =>
              Seq(s"cnv$k", s"ccv$k", s"npv$k")).mkString(", ")
            else ""},
         |    (COALESCE(cu.cont, 0)::DOUBLE + 0.5::DOUBLE)
         |      / (tv.t + 0.5::DOUBLE * (tv.nv + 1::DOUBLE)) AS p1
         |  FROM hg LEFT JOIN t$n USING (${(1 to n).map(j => s"w$j")
            .mkString(", ")})
         |          LEFT JOIN tc USING ($topKey)
         |$midJoins
         |          LEFT JOIN cu USING (w$n), tv
         |)$pStages, sc_top AS (
         |  SELECT doc_id,
         |    CAST(round(ln(
         |      CASE WHEN ctxn IS NOT NULL THEN
         |        (greatest(COALESCE(nn, 0)::DOUBLE - 0.75::DOUBLE,
         |                  0::DOUBLE)
         |         + 0.75::DOUBLE * n1pn::DOUBLE * p${n - 1})
         |        / ctxn::DOUBLE
         |      ELSE p${n - 1} END), 9) AS DECIMAL(28,9)) AS logp
         |  FROM sc${n - 1}
         |)
         |SELECT doc_id, count(*)::BIGINT AS n_ngrams,
         |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6)
         |    AS avg_logprob
         |FROM sc_top GROUP BY 1""".stripMargin
    }
    // order-3 oracle: the same generator at order 3 (the generated
    // form replaced the original hand-written CTE chain once both
    // gated green against the Spark output on identical results)
    val kn3OracleSql = knNOracleSql(3)

    // the q_sim_ann oracle body, shared with the recall@k eval
    val annTopKSql =
      s"""WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), nz AS (
          |  SELECT vec_id, e FROM v
          |  WHERE sqrt(list_dot_product(e, e)) > 0
          |), planes(p, hv) AS (
          |  VALUES
          |    $annPlanesSql
          |), bkt AS (
          |  SELECT nz.vec_id,
          |    CAST(sum(CASE WHEN list_dot_product(nz.e, planes.hv) >= 0
          |             THEN 1 << planes.p ELSE 0 END) AS BIGINT) AS b
          |  FROM nz CROSS JOIN planes GROUP BY nz.vec_id
          |), qp AS (
          |  SELECT b1.vec_id AS query_id, xor(b1.b, f.f) AS bucket
          |  FROM bkt b1, (VALUES (0), (1), (2), (4), (8), (16), (32)) f(f)
          |  WHERE b1.vec_id < 10
          |), cand AS (
          |  SELECT qp.query_id, cb.vec_id AS neighbor_id
          |  FROM qp JOIN bkt cb ON cb.b = qp.bucket
          |  WHERE cb.vec_id <> qp.query_id
          |), scored AS (
          |  SELECT c.query_id, c.neighbor_id,
          |    list_dot_product(q.e, n.e)
          |      / (sqrt(list_dot_product(q.e, q.e))
          |         * sqrt(list_dot_product(n.e, n.e))) AS cos_raw
          |  FROM cand c
          |  JOIN nz q ON q.vec_id = c.query_id
          |  JOIN nz n ON n.vec_id = c.neighbor_id
          |), ranked AS (
          |  SELECT query_id, neighbor_id,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank,
          |    round(cos_raw, 6) AS cosine
          |  FROM scored
          |)
          |SELECT query_id, neighbor_id, rank, cosine
          |FROM ranked WHERE rank <= 5""".stripMargin

    val exactTopKSql =
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) AS cos_raw
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND q.vec_id <> c.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_raw DESC, neighbor_id) AS rank,
        |    round(cos_raw, 6) AS cosine
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, cosine
        |FROM ranked WHERE rank <= 5""".stripMargin

    // quantized-cosine top-5: integer code dots are exact in both
    // engines (64×127² < 2^53), the double cosine division has
    // identical shape. Oracle for the integer-scored brute force AND
    // the SQ8 index probed at nprobe = nlist (provably the same search)
    val int8TopKSql =
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |    COALESCE(list_max([abs(x) FOR x IN e]), 0) / 127.0 AS scale, e
        |  FROM v
        |), cd AS (
        |  SELECT vec_id,
        |    CASE WHEN scale = 0 THEN [0 FOR x IN e]
        |         ELSE [CAST(round(x / scale, 0) AS INTEGER) FOR x IN e]
        |    END AS codes
        |  FROM qz
        |), sd AS (
        |  SELECT vec_id, codes,
        |    list_sum([c * c FOR c IN codes])::BIGINT::DOUBLE AS selfdot
        |  FROM cd
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum([q.codes[i] * c.codes[i]
        |              FOR i IN range(1, len(q.codes) + 1)])
        |      ::BIGINT::DOUBLE
        |      / (sqrt(q.selfdot) * sqrt(c.selfdot)) AS cos_raw
        |  FROM sd q JOIN sd c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_raw DESC, neighbor_id) AS rank,
        |    round(cos_raw, 6) AS cosine
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, cosine
        |FROM ranked WHERE rank <= 5""".stripMargin

    val base = Map(
      "q_fn_root" ->
        """SELECT c_custkey, upper(c_name) AS c_name, c_nationkey, c_acctbal,
          |       lower(c_mktsegment) AS c_mktsegment
          |FROM customer""".stripMargin,

      "q_fn_newroot" ->
        """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
          |       c_mktsegment || '/' || c_name AS full_label,
          |       'hello' AS greeting
          |FROM customer""".stripMargin,

      "q_fn_compose" ->
        """SELECT p_partkey, p_name, p_brand,
          |       substring(upper(p_type), 1, 5) AS p_type, p_size,
          |       p_retailprice
          |FROM part""".stripMargin,

      "q_fn_nested" ->
        """SELECT o_orderkey, o_orderstatus AS status,
          |       upper(o_orderpriority) AS priority,
          |       substring(upper(o_orderpriority), 1, 1) AS prio_class
          |FROM orders""".stripMargin,

      "q_fn_array" ->
        """SELECT p_partkey, i - 1 AS pos, upper(w[i]) AS word
          |FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part),
          |     LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i)""".stripMargin,

      // string-shingle mirror of the hashed-shingle sweep (hash is
      // injective on this corpus — pinned by the cardinality property)
      "q_curation_decontaminate" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |), sh AS (
          |  SELECT doc_id,
          |         CASE WHEN len(w) >= 3 THEN list_distinct(
          |           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            FOR i IN range(1, greatest(len(w)-1, 1))])
          |         ELSE [] END AS s
          |  FROM toks
          |), bench AS (
          |  SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 10 = 0
          |), corpus AS (
          |  SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 10 <> 0
          |)
          |SELECT c.doc_id, count(DISTINCT c.shingle) AS n_shared
          |FROM corpus c JOIN bench b USING (shingle)
          |GROUP BY 1 HAVING count(DISTINCT c.shingle) >= 5""".stripMargin,

      "q_text_scrub" ->
        """SELECT doc_id, regexp_replace(regexp_replace(
          |    text || ' contact: user' || CAST(doc_id AS VARCHAR)
          |         || '@example.com or 555-123-4567',
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          |    '[EMAIL]', 'g'),
          |  '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '[PHONE]', 'g') AS scrubbed
          |FROM documents""".stripMargin,

      // held-out split: lm/ctx/vocab from the 90% TRAIN side only
      "q_text_lm_heldout" ->
        """WITH train AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
          |), held AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
          |), tbg AS (
          |  SELECT w[i] AS w1, w[i+1] AS w2
          |  FROM (SELECT string_split(text, ' ') AS w FROM train),
          |       LATERAL (SELECT unnest(range(1, len(w))) AS i)
          |), lm AS (
          |  SELECT w1, w2, count(*)::BIGINT AS n FROM tbg GROUP BY 1, 2
          |), ctx AS (
          |  SELECT w1, sum(n)::BIGINT AS ctx FROM lm GROUP BY 1
          |), v AS (
          |  SELECT count(DISTINCT tok)::BIGINT AS nv FROM
          |    (SELECT unnest(string_split(text, ' ')) AS tok FROM train)
          |), hbg AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM held),
          |       LATERAL (SELECT unnest(range(1, len(w))) AS i)
          |), scored AS (
          |  SELECT hbg.doc_id,
          |    CAST(round(ln(
          |      (COALESCE(lm.n, 0)::DOUBLE + 0.5::DOUBLE)
          |      / (COALESCE(ctx.ctx, 0)::DOUBLE
          |         + (0.5::DOUBLE * v.nv::DOUBLE))), 9)
          |      AS DECIMAL(28,9)) AS logp
          |  FROM hbg LEFT JOIN lm USING (w1, w2)
          |           LEFT JOIN ctx USING (w1), v
          |)
          |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
          |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS avg_logprob
          |FROM scored GROUP BY 1""".stripMargin,

      // Kneser-Ney mirrored exactly: same interpolated-discount double
      // arithmetic shape (continuation probability add-half smoothed
      // over T types and V+1 vocab), per-bigram round(9), DECIMAL sum
      "q_text_lm_kn" -> knOracleSql,

      "q_text_lm_kn_stored" -> knOracleSql,

      "q_text_lm_kn3" -> kn3OracleSql,

      "q_text_lm_kn3_stored" -> kn3OracleSql,

      "q_text_lm_kn5" -> knNOracleSql(5),

      // same presence pass, integer contingency cells, one double
      // formula in identical left-associated shape; rank on the
      // unrounded chi2, ties to the lexicographically-first token
      "q_text_chisq" ->
        """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
          |pres AS (
          |  SELECT doc_id, lang AS label,
          |    unnest(list_distinct(string_split(text, ' '))) AS w
          |  FROM documents
          |), cells AS (
          |  SELECT w, label, count(*)::BIGINT AS n11
          |  FROM pres GROUP BY 1, 2
          |), tokf AS (
          |  SELECT w, nt FROM (
          |    SELECT w, sum(n11)::BIGINT AS nt FROM cells GROUP BY 1), nn
          |  WHERE nt >= 5 AND nt < nn.n
          |), labf AS (
          |  SELECT label, nl FROM (
          |    SELECT lang AS label, count(*)::BIGINT AS nl
          |    FROM documents GROUP BY 1), nn
          |  WHERE nl < nn.n
          |), grid AS (
          |  SELECT t.w, l.label, t.nt, l.nl,
          |         coalesce(c.n11, 0)::BIGINT AS n11
          |  FROM tokf t CROSS JOIN labf l
          |  LEFT JOIN cells c ON c.w = t.w AND c.label = l.label
          |), scored AS (
          |  SELECT w, label, n11,
          |    nn.n::DOUBLE
          |      * ((n11 * (nn.n - nt - nl + n11)
          |          - (nt - n11) * (nl - n11))::DOUBLE)
          |      * ((n11 * (nn.n - nt - nl + n11)
          |          - (nt - n11) * (nl - n11))::DOUBLE)
          |      / (nt::DOUBLE * (nn.n - nt)::DOUBLE
          |         * nl::DOUBLE * (nn.n - nl)::DOUBLE) AS chi2
          |  FROM grid, nn
          |)
          |SELECT label, w AS token, n11,
          |  row_number() OVER (PARTITION BY label
          |    ORDER BY chi2 DESC, w) AS rank,
          |  round(chi2, 6) AS chi2
          |FROM scored
          |QUALIFY rank <= 10""".stripMargin,

      // the KN oracle composed with exact interpolated terciles (both
      // sides round the thresholds to 6 before comparing, the
      // q_curation_quantile discipline); banding CASE shape identical
      "q_text_ppl_buckets" ->
        s"""WITH kn AS ($knOracleSql
           |), q AS (
           |  SELECT round(quantile_cont(avg_logprob, ${1.0 / 3}), 6) AS q1,
           |         round(quantile_cont(avg_logprob, ${2.0 / 3}), 6) AS q2
           |  FROM kn
           |)
           |SELECT doc_id, avg_logprob,
           |  CASE WHEN avg_logprob >= q2 THEN 'head'
           |       WHEN avg_logprob >= q1 THEN 'middle'
           |       ELSE 'tail' END AS bucket
           |FROM kn, q""".stripMargin,

      // integer code dots are exact in both engines (64×127² < 2^53),
      // and the double cosine division has identical shape
      "q_sim_topk_int8" -> int8TopKSql,

      // SQ8 index probed at nprobe = nlist ⇒ exact over the quantized
      // corpus (same oracle)
      "q_sim_ivf_int8" -> int8TopKSql,

      // same scale/round/dequantize arithmetic in doubles; round-half
      // -away-from-zero agrees between Spark and DuckDB
      "q_sim_quantized" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), q AS (
          |  SELECT vec_id, e,
          |    COALESCE(list_max([abs(x) FOR x IN e]), 0) / 127.0 AS scale
          |  FROM v
          |), c AS (
          |  SELECT vec_id, e, scale,
          |    CASE WHEN scale = 0 THEN [0 FOR x IN e]
          |         ELSE [CAST(round(x / scale, 0) AS INTEGER) FOR x IN e]
          |    END AS codes
          |  FROM q
          |)
          |SELECT vec_id, round(scale, 9) AS scale,
          |  list_sum(codes)::BIGINT AS code_sum,
          |  round(list_cosine_similarity(e,
          |    [cd * scale FOR cd IN codes]), 6) AS fidelity
          |FROM c""".stripMargin,

      // mirrors LanguageModel exactly: same add-k arithmetic SHAPE in
      // doubles (the ::DOUBLE casts defeat DuckDB's DECIMAL literal
      // math), per-bigram round(9) then DECIMAL sum
      "q_text_lm" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |), bg AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i)
          |), lm AS (
          |  SELECT w1, w2, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2
          |), ctx AS (
          |  SELECT w1, sum(n)::BIGINT AS ctx FROM lm GROUP BY 1
          |), v AS (
          |  SELECT count(DISTINCT tok)::BIGINT AS nv
          |  FROM (SELECT unnest(w) AS tok FROM toks)
          |), scored AS (
          |  SELECT bg.doc_id,
          |    CAST(round(ln(
          |      (COALESCE(lm.n, 0)::DOUBLE + 0.5::DOUBLE)
          |      / (COALESCE(ctx.ctx, 0)::DOUBLE
          |         + (0.5::DOUBLE * v.nv::DOUBLE))), 9)
          |      AS DECIMAL(28,9)) AS logp
          |  FROM bg LEFT JOIN lm USING (w1, w2)
          |          LEFT JOIN ctx USING (w1), v
          |)
          |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
          |  round(CAST(sum(logp) AS DOUBLE) / count(*), 6) AS avg_logprob
          |FROM scored GROUP BY 1""".stripMargin,

      // prefix-of-the-ranked-stream budget semantics: inclusive running
      // token sum per lang ordered (n_chars DESC, doc_id), kept while
      // it fits — exact integers, no float boundary
      "q_curation_budget" ->
        """WITH c AS (
          |  SELECT doc_id, lang,
          |    CAST(sum(len(string_split(text, ' '))) OVER (
          |      PARTITION BY lang ORDER BY n_chars DESC, doc_id
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
          |  FROM documents
          |)
          |SELECT doc_id, lang, cum_tokens FROM c
          |WHERE cum_tokens <= 2000""".stripMargin,

      // DSIR weights: same md5-prefix bucket hash as the weighted-sample
      // oracle, add-k unigram models over 1024 buckets, per-token
      // round-9 log-ratios subtracted and summed as DECIMAL
      "q_sample_importance" ->
        """WITH tok AS (
          |  SELECT doc_id, lang,
          |    ('0x' || substr(md5(tk), 1, 12))::BIGINT % 1024 AS b
          |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
          |        FROM documents)
          |), tgt AS (
          |  SELECT b, count(*)::BIGINT AS ct FROM tok WHERE lang = 'en'
          |  GROUP BY 1
          |), raw AS (
          |  SELECT b, count(*)::BIGINT AS cr FROM tok GROUP BY 1
          |), nt AS (SELECT sum(ct)::BIGINT AS n FROM tgt),
          |nr AS (SELECT sum(cr)::BIGINT AS n FROM raw),
          |lr AS (
          |  SELECT tok.doc_id,
          |    CAST(round(ln((COALESCE(tgt.ct, 0)::DOUBLE + 0.5)
          |      / (nt.n::DOUBLE + (0.5 * 1024))), 9) AS DECIMAL(28,9))
          |    - CAST(round(ln((COALESCE(raw.cr, 0)::DOUBLE + 0.5)
          |      / (nr.n::DOUBLE + (0.5 * 1024))), 9) AS DECIMAL(28,9)) AS d
          |  FROM tok LEFT JOIN tgt USING (b) LEFT JOIN raw USING (b), nt, nr
          |)
          |SELECT doc_id, count(*)::BIGINT AS n_tokens,
          |  round(CAST(sum(d) AS DOUBLE), 6) AS log_ratio
          |FROM lr GROUP BY 1""".stripMargin,

      "q_text_logreg" -> logregOracleSql(32, 3, 1.0, "lang = 'en'"),

      "q_text_logreg_score" ->
        logregScoreOracleSql(32, 3, 1.0, "lang = 'en'"),

      "q_text_logreg_stored" ->
        logregScoreOracleSql(32, 3, 1.0, "lang = 'en'"),

      // Naive Bayes: add-k token likelihoods vs the class total (unseen
      // tokens penalized against N_c — the LEFT JOIN keeps them), prior
      // added as a round-9 decimal, arg-max with label-asc tie-break
      "q_text_classify" ->
        """WITH train AS (
          |  SELECT * FROM documents WHERE doc_id % 10 <> 0
          |), test AS (
          |  SELECT * FROM documents WHERE doc_id % 10 = 0
          |), ttok AS (
          |  SELECT lang AS label, unnest(string_split(text, ' ')) AS token
          |  FROM train
          |), lik AS (
          |  SELECT label, token, count(*)::BIGINT AS n FROM ttok GROUP BY 1, 2
          |), tot AS (
          |  SELECT label, sum(n)::BIGINT AS tot FROM lik GROUP BY 1
          |), v AS (
          |  SELECT count(DISTINCT token)::BIGINT AS nv FROM ttok
          |), pri AS (
          |  SELECT lang AS label, count(*)::BIGINT AS nd FROM train GROUP BY 1
          |), ntr AS (SELECT count(*)::BIGINT AS n FROM train),
          |dtok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM test
          |), scored AS (
          |  SELECT dtok.doc_id, pri.label,
          |    sum(CAST(round(ln((COALESCE(lik.n, 0)::DOUBLE + 0.5)
          |      / (tot.tot::DOUBLE + (0.5 * v.nv::DOUBLE))), 9)
          |      AS DECIMAL(28,9))) AS s
          |  FROM dtok CROSS JOIN pri
          |  LEFT JOIN lik ON lik.token = dtok.token AND lik.label = pri.label
          |  JOIN tot ON tot.label = pri.label, v
          |  GROUP BY 1, 2
          |), ranked AS (
          |  SELECT sc.doc_id, sc.label,
          |    sc.s + CAST(round(ln(pri.nd::DOUBLE / ntr.n::DOUBLE), 9)
          |      AS DECIMAL(28,9)) AS score_dec
          |  FROM scored sc JOIN pri USING (label), ntr
          |), best AS (
          |  SELECT doc_id, label AS pred_label,
          |    round(CAST(score_dec AS DOUBLE), 6) AS score,
          |    row_number() OVER (PARTITION BY doc_id
          |      ORDER BY score_dec DESC, label) AS rn
          |  FROM ranked
          |)
          |SELECT b.doc_id, b.pred_label, b.score, t.lang
          |FROM best b JOIN test t USING (doc_id) WHERE b.rn = 1""".stripMargin,

      // sliding ℓ-gram replica of the positional phrase match: same
      // 0-based positions, same overlap-counting occurrence semantics
      "q_text_phrase" ->
        """WITH q(query_id, phrase) AS (
          |  VALUES (0, 'table hash'), (1, 'customer join'),
          |         (2, 'merge group'), (3, 'slow hash batch'),
          |         (4, 'window fast query')
          |), ql AS (
          |  SELECT query_id, phrase,
          |         len(string_split(phrase, ' ')) AS l
          |  FROM q
          |), d AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |), hits AS (
          |  SELECT ql.query_id, d.doc_id, CAST(i - 1 AS INT) AS pos
          |  FROM d JOIN ql ON len(d.w) >= ql.l,
          |       unnest(range(1, CAST(len(d.w) - ql.l + 2 AS BIGINT)))
          |         AS t(i)
          |  WHERE array_to_string(
          |          d.w[CAST(i AS INT):CAST(i + ql.l - 1 AS INT)], ' ')
          |        = ql.phrase
          |)
          |SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
          |       CAST(min(pos) AS INT) AS first_pos
          |FROM hits GROUP BY 1, 2""".stripMargin,

      // Cavnar-Trenkle out-of-place replica: per-label and per-doc
      // char-trigram rank profiles with (count desc, gram asc)
      // tie-breaks, distance = m*topN + SUM(|dr - lr| - topN) over
      // matched grams — all-integer, so engine-exact by construction
      "q_text_langid" ->
        """WITH train AS (
          |  SELECT * FROM documents WHERE doc_id % 10 <> 0
          |), test AS (
          |  SELECT * FROM documents WHERE doc_id % 10 = 0
          |), tg AS (
          |  SELECT label, substr(text, CAST(i AS INT), 3) AS gram
          |  FROM (SELECT lang AS label, text,
          |          unnest(range(1, greatest(length(text) - 1, 1))) AS i
          |        FROM train)
          |), prof AS (
          |  SELECT label, gram,
          |    row_number() OVER (PARTITION BY label
          |      ORDER BY count(*) DESC, gram) AS lr
          |  FROM tg GROUP BY 1, 2
          |  QUALIFY lr <= 50
          |), dg AS (
          |  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram
          |  FROM (SELECT doc_id, text,
          |          unnest(range(1, greatest(length(text) - 1, 1))) AS i
          |        FROM test)
          |), dr AS (
          |  SELECT doc_id, gram,
          |    row_number() OVER (PARTITION BY doc_id
          |      ORDER BY count(*) DESC, gram) AS dr
          |  FROM dg GROUP BY 1, 2
          |  QUALIFY dr <= 30
          |), m AS (
          |  SELECT doc_id, count(*)::BIGINT AS m FROM dr GROUP BY 1
          |), adj AS (
          |  SELECT d.doc_id, p.label,
          |    CAST(sum(abs(d.dr - p.lr) - 50) AS BIGINT) AS adj
          |  FROM dr d JOIN prof p USING (gram) GROUP BY 1, 2
          |), dist AS (
          |  SELECT m.doc_id, l.label,
          |    CAST(m.m * 50 + COALESCE(a.adj, 0) AS BIGINT) AS dist
          |  FROM m CROSS JOIN (SELECT DISTINCT label FROM prof) l
          |  LEFT JOIN adj a ON a.doc_id = m.doc_id AND a.label = l.label
          |), best AS (
          |  SELECT doc_id, label AS pred_label, dist,
          |    row_number() OVER (PARTITION BY doc_id
          |      ORDER BY dist, label) AS rn
          |  FROM dist
          |)
          |SELECT b.doc_id, b.pred_label, b.dist, t.lang
          |FROM best b JOIN test t USING (doc_id) WHERE b.rn = 1""".stripMargin,

      // mirrors TextSearch.bm25TopK exactly: same smoothed idf, same
      // arithmetic shape (so IEEE ops match), per-term round(9) then
      // DECIMAL sum for order independence, same (score, doc_id) ranking
      "q_text_bm25" -> bm25OracleSql,

      "q_text_ql" -> qlOracleSql,

      // index build -> probe reproduces the direct scoring exactly, so
      // the oracle IS the direct-BM25 SQL
      "q_text_bm25_indexed" -> bm25OracleSql,
      "q_pipeline_indexed" -> bm25OracleSql,

      // merge == rebuild: the merged-index probe must score exactly as
      // the full corpus does
      "q_text_bm25_merged" -> bm25OracleSql,

      // hybrid RRF: the BM25 oracle (top-20) and the exact dense top-20
      // re-derived as CTEs, then the same round(9)-decimal-summed
      // 1/(60+rank) fusion and (score desc, doc_id) tie-break
      "q_text_hybrid" ->
        """WITH q(query_id, qtext) AS (
          |  VALUES (0, 'spark join fast'), (1, 'vector scan slow'),
          |         (2, 'customer order line'), (3, 'window agg group'),
          |         (4, 'hash merge sort batch')
          |), toks AS (
          |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
          |         unnest(string_split(text, ' ')) AS term
          |  FROM documents
          |), stats AS (
          |  SELECT count(*)::DOUBLE AS n,
          |         avg(len(string_split(text, ' ')))::DOUBLE AS avgdl
          |  FROM documents
          |), qterms AS (
          |  SELECT DISTINCT query_id,
          |         unnest(string_split(qtext, ' ')) AS term
          |  FROM q
          |), tf AS (
          |  SELECT term, doc_id, dl, count(*)::DOUBLE AS tf
          |  FROM toks WHERE term IN (SELECT term FROM qterms)
          |  GROUP BY 1, 2, 3
          |), posting AS (
          |  SELECT tf.*, count(*) OVER (PARTITION BY term)::DOUBLE AS df
          |  FROM tf
          |), bscored AS (
          |  SELECT qt.query_id, p.doc_id,
          |    sum(CAST(round(
          |      ln(1 + (s.n - p.df + 0.5) / (p.df + 0.5))
          |        * p.tf * (1.2 + 1)
          |        / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)),
          |      9) AS DECIMAL(28,9))) AS score_dec
          |  FROM posting p JOIN qterms qt USING (term), stats s
          |  GROUP BY 1, 2
          |), sparse AS (
          |  SELECT query_id::BIGINT AS query_id, doc_id,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY score_dec DESC, doc_id) AS rank
          |  FROM bscored
          |), dscored AS (
          |  SELECT qe.vec_id AS query_id, c.vec_id AS doc_id,
          |    list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
          |      CAST(c.embedding AS DOUBLE[])) AS cos_raw
          |  FROM embeddings qe JOIN embeddings c ON qe.vec_id < 5
          |    AND qe.vec_id <> c.vec_id
          |), dense AS (
          |  SELECT query_id, doc_id,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos_raw DESC, doc_id) AS rank
          |  FROM dscored
          |), runs AS (
          |  SELECT query_id, doc_id, rank FROM sparse WHERE rank <= 20
          |  UNION ALL
          |  SELECT query_id, doc_id, rank FROM dense WHERE rank <= 20
          |), fused AS (
          |  SELECT query_id, doc_id,
          |    sum(CAST(round(1.0 / (60 + rank), 9)
          |      AS DECIMAL(28,9))) AS rrf_dec,
          |    count(*)::INT AS n_runs
          |  FROM runs GROUP BY 1, 2
          |), ranked AS (
          |  SELECT query_id, doc_id,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY rrf_dec DESC, doc_id) AS rank,
          |    round(CAST(rrf_dec AS DOUBLE), 6) AS rrf_score, n_runs
          |  FROM fused
          |)
          |SELECT query_id, doc_id, rank, rrf_score, n_runs FROM ranked
          |WHERE rank <= 10""".stripMargin,

      "q_fn_map" ->
        """SELECT doc_id, 'chars' AS k, n_chars * 2 AS v FROM documents
          |UNION ALL
          |SELECT doc_id, 'double_id' AS k, doc_id * 2 AS v FROM documents""".stripMargin,

      // the struct function doubles bal and uppercases seg; the
      // array-of-struct function appends '!' to each element's n
      "q_fn_struct" ->
        """SELECT c_custkey, upper(c_mktsegment) AS seg,
          |       c_acctbal * 2 AS bal,
          |       c_name || '!' AS tag0, c_mktsegment || '!' AS tag1
          |FROM customer""".stripMargin,

      // the planted deep leaf is '   ' || o_orderpriority || '  ';
      // composition applies lower then trim in add-order
      "q_fn_deep" ->
        """SELECT o_orderkey, o_orderstatus AS has_pets,
          |       trim(lower('   ' || o_orderpriority || '  ')) AS deep_value
          |FROM orders""".stripMargin,

      "q_text_stats" ->
        """WITH toks AS (
          |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
          |)
          |SELECT doc_id,
          |  len(w) AS n_tokens,
          |  round(len(list_distinct(w))::DOUBLE / len(w), 6) AS type_token_ratio,
          |  round(list_sum([length(x) FOR x IN w])::DOUBLE / len(w), 6)
          |    AS mean_token_len,
          |  round((len(list_distinct(w))::DOUBLE / len(w)) *
          |    (CASE WHEN list_sum([length(x) FOR x IN w])::DOUBLE / len(w)
          |          BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END), 6) AS quality,
          |  CASE WHEN len([x FOR x IN w
          |                 IF x IN ('the','a','of','and','to','in')])::DOUBLE
          |            / len(w) >= 0.05
          |       THEN 'en' ELSE 'unk' END AS lang_pred,
          |  md5(lower(text)) AS fingerprint
          |FROM toks""".stripMargin,

      // Gopher rules: same tokenization (single-space split), same
      // integer char sums, double divisions, round-6 display values,
      // UNROUNDED keep comparisons
      "q_text_gopher" ->
        """WITH d AS (
          |  SELECT doc_id, text, string_split(text, ' ') AS w,
          |         string_split(text, chr(10)) AS ln
          |  FROM documents
          |), m AS (
          |  SELECT doc_id,
          |    len(w)::BIGINT AS n_words,
          |    list_reduce([len(x)::BIGINT FOR x IN w], (a, b) -> a + b)::DOUBLE
          |      / len(w) AS mean_len,
          |    ((len(text) - len(replace(text, '#', '')))
          |      + (len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE
          |      / len(w) AS sym,
          |    len(list_filter(ln, l -> starts_with(l, '- ')
          |        OR starts_with(l, '* ') OR starts_with(l, '• ')))::DOUBLE
          |      / len(ln) AS bullet,
          |    len(list_filter(ln, l -> ends_with(l, '...')))::DOUBLE
          |      / len(ln) AS ellip,
          |    len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
          |      / len(w) AS alpha,
          |    len(list_filter(w, x -> list_contains(
          |      ['the','be','to','of','and','that','have','with'],
          |      lower(x))))::BIGINT AS n_stop
          |  FROM d
          |)
          |SELECT doc_id, n_words,
          |  round(mean_len, 6) AS mean_word_len,
          |  round(sym, 6) AS symbol_ratio,
          |  round(bullet, 6) AS bullet_frac,
          |  round(ellip, 6) AS ellipsis_frac,
          |  round(alpha, 6) AS alpha_frac,
          |  n_stop,
          |  (n_words >= 50 AND n_words <= 100000
          |   AND mean_len >= 3.0 AND mean_len <= 10.0
          |   AND sym <= 0.1 AND bullet <= 0.9 AND ellip <= 0.3
          |   AND alpha >= 0.8 AND n_stop >= 1) AS keep
          |FROM m""".stripMargin,

      // the 13 Gopher repetition rules, counts by gram string (engine:
      // by 64-bit hash — identical up to negligible collisions)
      "q_text_gopher_rep" -> gopherRepOracleSql,

      // same signal fragments as q_text_stats, same min-max CASE
      // normalization, same left-associated weighted sum; keep on the
      // unrounded blend
      "q_text_blend" ->
        """WITH sig AS (
          |  SELECT doc_id,
          |    len(list_distinct(w))::DOUBLE / len(w) AS s1,
          |    list_sum([length(x) FOR x IN w])::DOUBLE / len(w) AS s2,
          |    len([x FOR x IN w
          |         IF x IN ('the','a','of','and','to','in')])::DOUBLE
          |      / len(w) AS s3
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w
          |        FROM documents)
          |), st AS (
          |  SELECT min(s1) AS mn1, max(s1) AS mx1,
          |         min(s2) AS mn2, max(s2) AS mx2,
          |         min(s3) AS mn3, max(s3) AS mx3 FROM sig
          |), n AS (
          |  SELECT doc_id,
          |    CASE WHEN mx1 > mn1 THEN (s1 - mn1) / (mx1 - mn1)
          |         ELSE 0.5 END AS n1,
          |    CASE WHEN mx2 > mn2 THEN (s2 - mn2) / (mx2 - mn2)
          |         ELSE 0.5 END AS n2,
          |    CASE WHEN mx3 > mn3 THEN (s3 - mn3) / (mx3 - mn3)
          |         ELSE 0.5 END AS n3
          |  FROM sig, st
          |)
          |SELECT doc_id, round(n1, 6) AS n_ttr, round(n2, 6) AS n_len,
          |  round(n3, 6) AS n_stop,
          |  round(0.4 * n1 + 0.3 * n2 + 0.3 * n3, 6) AS blend,
          |  (0.4 * n1 + 0.3 * n2 + 0.3 * n3) >= 0.5 AS keep
          |FROM n""".stripMargin,

      // C4 cleaning over the SAME deterministically-derived page
      // structure as the entry (8-word lines, '.' iff
      // (doc_id + idx) % 4 != 3), then the same line filter and
      // page gates
      "q_text_c4" ->
        """WITH d AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |), s AS (
          |  SELECT doc_id,
          |    array_to_string([array_to_string(w[(i*8+1):(i*8+8)], ' ') ||
          |        (CASE WHEN (doc_id + i) % 4 <> 3 THEN '.' ELSE '' END)
          |      FOR i IN range(0, CAST(ceil(len(w) / 8.0) AS INT))],
          |      chr(10)) AS text
          |  FROM d
          |), f AS (
          |  SELECT doc_id, text, string_split(text, chr(10)) AS ln,
          |    list_filter(string_split(text, chr(10)), l ->
          |      (ends_with(l, '.') OR ends_with(l, '!')
          |        OR ends_with(l, '?') OR ends_with(l, '"'))
          |      AND len(string_split(l, ' ')) >= 3
          |      AND NOT contains(lower(l), 'javascript')) AS kept
          |  FROM s
          |), c AS (
          |  -- coalesce: DuckDB's array_to_string of an EMPTY list is
          |  -- NULL where Spark's array_join is '' (the all-lines-dropped
          |  -- page)
          |  SELECT doc_id, text, ln, kept,
          |    coalesce(array_to_string(kept, chr(10)), '') AS tc,
          |    (length(coalesce(array_to_string(kept, chr(10)), ''))
          |      - length(replace(replace(replace(coalesce(array_to_string(
          |          kept, chr(10)), ''), '.', ''), '!', ''), '?', ''))
          |      )::BIGINT AS ns
          |  FROM f
          |)
          |SELECT doc_id, tc AS text_clean,
          |  len(ln)::BIGINT AS n_lines,
          |  len(kept)::BIGINT AS n_lines_kept,
          |  ns AS n_sentences,
          |  (ns >= 4 AND NOT contains(lower(text), 'lorem ipsum')
          |    AND NOT contains(text, '{')) AS keep
          |FROM c""".stripMargin,

      // full extraction replication: same deterministic page wrapper,
      // same regexp strip chain (script/style/noscript subtrees,
      // comments, chr(1)/chr(2) anchor markers, block tags -> newline,
      // remaining tags -> space, entities with &amp; last), same
      // per-line collapse/trim and multiplication-form keep rules
      "q_text_extract" ->
        ("""WITH h AS (
          |  SELECT doc_id,
          |    '<html><head><title>t</title>' ||
          |    '<script type="text/javascript">var x = 1 < 2;</script>' ||
          |    '<style>.nav a{color:#00c}</style></head><body>' ||
          |    '<nav><a href="/">Home</a> <a href="/about">About</a> ' ||
          |    '<a href="/contact">Contact</a></nav><h1>Doc ' ||
          |    CAST(doc_id AS VARCHAR) ||
          |    '</h1><!-- ad slot --><p>' || text ||
          |    '</p><p>This page is the &quot;fast&nbsp;&amp; ' ||
          |    'loose&quot; guide; it&#39;s about &lt;scale&gt;.</p>' ||
          |    '<div class="footer"><a href="/tos">Terms of service</a>' ||
          |    ' | <a href="/privacy">Privacy</a></div></body></html>'
          |      AS html
          |  FROM documents
          |), stripped AS (
          |  SELECT doc_id,
          |    replace(replace(replace(replace(replace(replace(
          |      regexp_replace(
          |      regexp_replace(
          |      regexp_replace(
          |      regexp_replace(
          |      regexp_replace(
          |      regexp_replace(
          |      regexp_replace(
          |      regexp_replace(html,
          |        '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
          |        '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
          |        '(?is)<noscript\b[^>]*>.*?</noscript\s*>', ' ', 'g'),
          |        '(?s)<!--.*?-->', ' ', 'g'),
          |        '(?is)<a\b[^>]*>', chr(1), 'g'),
          |        '(?is)</a\s*>', chr(2), 'g'),
          |        '(?is)</?(""" +
          HtmlBlockTagsSql + """)\b[^>]*>', chr(10), 'g'),
          |        '(?s)<[^>]*>', ' ', 'g'),
          |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
          |      '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS txt
          |  FROM h
          |), ls AS MATERIALIZED (
          |  SELECT doc_id, string_split(txt, chr(10)) AS lines
          |  FROM stripped
          |), ln AS (
          |  SELECT doc_id, i,
          |    trim(regexp_replace(lines[i], '\s+', ' ', 'g')) AS collapsed
          |  FROM ls,
          |    unnest(range(1, CAST(len(lines) AS BIGINT) + 1)) AS r(i)
          |), feat AS (
          |  SELECT doc_id, i,
          |    trim(regexp_replace(collapsed,
          |      '[' || chr(1) || chr(2) || ']', '', 'g')) AS vis,
          |    coalesce(list_sum(list_transform(
          |      regexp_extract_all(collapsed,
          |        chr(1) || '([^' || chr(1) || chr(2) || ']*)' || chr(2),
          |        1),
          |      x -> len(x))), 0) AS lk
          |  FROM ln
          |), tok AS (
          |  SELECT doc_id, i, vis, lk,
          |    len(string_split(vis, ' ')) AS nt,
          |    len(list_filter(string_split(vis, ' '), x ->
          |      list_contains([""" + HtmlStopwordsSql + """],
          |        lower(x)))) AS st
          |  FROM feat
          |), kept AS (
          |  SELECT doc_id, i, vis FROM tok
          |  WHERE len(vis) >= 25
          |    AND CAST(lk AS DOUBLE) <= 0.33 * CAST(len(vis) AS DOUBLE)
          |    AND CAST(st AS DOUBLE) >= 0.01 * CAST(nt AS DOUBLE)
          |), agg AS (
          |  SELECT doc_id, string_agg(vis, chr(10) ORDER BY i)
          |      AS text_main,
          |    count(*) AS n_kept
          |  FROM kept GROUP BY doc_id
          |)
          |SELECT l.doc_id, coalesce(agg.text_main, '') AS text_main,
          |  CAST(len(l.lines) AS BIGINT) AS n_lines,
          |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_lines_kept
          |FROM ls l LEFT JOIN agg ON agg.doc_id = l.doc_id""")
          .stripMargin,

      // unigram-LM training replicated with the EM/Viterbi rounds
      // unrolled; the kept (rank, piece, weight, logprob) table
      "q_text_unigram" ->
        (s"WITH ${unigramTrainCtes(60, 4, 40, 2, 8)}\n" +
          "SELECT rank, piece, weight, logprob FROM uvocab"),

      // the same train CTEs + the encode DP over the held-out slice
      "q_text_unigram_encode" ->
        unigramEncodeOracleSql(60, 4, 40, 2, 8, "doc_id % 10 = 0"),

      "q_text_unigram_stored" ->
        unigramEncodeOracleSql(60, 4, 40, 2, 8, "doc_id % 10 = 0"),

      // link extraction replicated step-for-step (shared CTE chain)
      "q_text_links" ->
        (s"WITH ${linksOracleCte()}\n" +
          "SELECT doc_id, link_pos, href, href_abs, anchor FROM lk"),

      // same chain with the per-document source host in the base;
      // dst host through the UrlOps.hostOf grammar (fragment strip,
      // http(s) gate, userinfo/port strip, lowercase), src host
      // stated as ground truth
      "q_graph_hostgraph" ->
        (s"WITH ${linksOracleCte(
          "'https://site' || CAST(doc_id % 7 AS VARCHAR) || " +
            "'.example.com/dir' || CAST(doc_id % 5 AS VARCHAR) || " +
            "'/page/index.html'")}, " +
          """hp AS (
          |  SELECT doc_id,
          |    regexp_replace(trim(href_abs), '#.*$', '') AS t
          |  FROM lk
          |), hg AS (
          |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR)
          |      || '.example.com' AS src_host,
          |    lower(regexp_replace(regexp_replace(
          |      regexp_extract(t, '^(?i)https?://([^/?#]*)', 1),
          |      '^[^@]*@', ''), ':[0-9]*$', '')) AS dst_host,
          |    doc_id
          |  FROM hp
          |  WHERE regexp_matches(t, '^(?i)https?://[^/?#]+')
          |)
          |SELECT src_host, dst_host, count(*) AS n_links,
          |       count(DISTINCT doc_id) AS n_pages
          |FROM hg WHERE dst_host IS NOT NULL AND dst_host <> ''
          |GROUP BY 1, 2""".stripMargin),

      // anchor aggregation over the same chain: per-target counts,
      // distinct sources, dominant anchor by (count desc, anchor asc)
      "q_text_anchors" ->
        (s"WITH ${linksOracleCte()}, " +
          """pa AS (
          |  SELECT href_abs, anchor AS a, count(*) AS n
          |  FROM lk GROUP BY 1, 2
          |), tp AS (
          |  SELECT href_abs, n_links, a AS top_anchor,
          |         n AS top_anchor_n
          |  FROM (
          |    SELECT href_abs, a, n,
          |      sum(n) OVER (PARTITION BY href_abs) AS n_links,
          |      row_number() OVER (PARTITION BY href_abs
          |        ORDER BY n DESC, a) AS rn
          |    FROM pa)
          |  WHERE rn = 1
          |), lsrc AS (
          |  SELECT href_abs, count(DISTINCT doc_id) AS n_sources
          |  FROM lk GROUP BY 1
          |)
          |SELECT t.href_abs, CAST(t.n_links AS BIGINT) AS n_links,
          |  CAST(s.n_sources AS BIGINT) AS n_sources, t.top_anchor,
          |  CAST(t.top_anchor_n AS BIGINT) AS top_anchor_n
          |FROM tp t JOIN lsrc s USING (href_abs)""".stripMargin),

      // robots parse + gate replicated: same line grammar, the
      // consecutive-UA group windows, group selection, rule
      // extraction, longest-prefix/Allow-tie decision per distinct
      // (host, path) key, default allow
      // ground truth of the planted Sitemap lines, stated directly
      // (the empty-value line must have been dropped by the parse)
      "q_url_sitemaps" ->
        """WITH h AS (SELECT DISTINCT source FROM documents)
          |SELECT source || '.example.com' AS host,
          |  'https://' || source || '.example.com/sitemap.xml'
          |    AS sitemap_url
          |FROM h
          |UNION ALL
          |SELECT source || '.example.com',
          |  'https://' || source || '.example.com/sitemap-news.xml'
          |FROM h""".stripMargin,

      "q_url_robots" ->
        """WITH rhosts AS (SELECT DISTINCT source FROM documents),
          |rb AS (
          |  SELECT source || '.example.com' AS host,
          |    '# rules' || chr(10) || 'User-agent: megabot' || chr(10)
          |    || 'Disallow: /' || chr(10) || chr(10) ||
          |    'User-agent: *' || chr(10) || 'Allow: /public/archive/'
          |    || chr(10) || 'Disallow: /public/' || chr(10) ||
          |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 1
          |      THEN 'Disallow: /tmp' || chr(10) ELSE '' END AS body
          |  FROM rhosts
          |), rln AS (
          |  SELECT host, i,
          |    lower(regexp_extract(l2, '^([A-Za-z-]+)\s*:', 1)) AS dir,
          |    trim(regexp_extract(l2, ':\s*(.*)$', 1)) AS value
          |  FROM (
          |    SELECT host, i, trim(regexp_replace(lines[i],
          |      '#.*$', '')) AS l2
          |    FROM (SELECT host, string_split(body, chr(10)) AS lines
          |          FROM rb) t,
          |         unnest(range(1, CAST(len(lines) AS BIGINT) + 1)) r(i)
          |  ) x
          |  WHERE lower(regexp_extract(l2, '^([A-Za-z-]+)\s*:', 1))
          |    IN ('user-agent', 'allow', 'disallow')
          |), rst AS (
          |  SELECT host, i, dir, value,
          |    CASE WHEN dir = 'user-agent' AND
          |        (lag(dir) OVER (PARTITION BY host ORDER BY i)
          |          IS DISTINCT FROM 'user-agent') THEN 1 ELSE 0 END
          |      AS starts
          |  FROM rln
          |), rgrp AS (
          |  SELECT host, i, dir, value,
          |    sum(starts) OVER (PARTITION BY host ORDER BY i
          |      ROWS UNBOUNDED PRECEDING) AS grp
          |  FROM rst
          |), rag AS MATERIALIZED (
          |  SELECT host, grp, list(DISTINCT lower(value)) AS agents
          |  FROM rgrp WHERE dir = 'user-agent' AND grp > 0
          |  GROUP BY host, grp
          |), rsel AS (
          |  SELECT g.host, g.grp FROM rag g
          |  JOIN (SELECT host,
          |          max(CASE WHEN list_contains(agents, '*') THEN 1
          |              ELSE 0 END) AS hs
          |        FROM rag GROUP BY host) h ON h.host = g.host
          |  WHERE list_contains(g.agents, '*')
          |), rl AS MATERIALIZED (
          |  SELECT DISTINCT g.host, (dir = 'allow') AS allow,
          |    value AS prefix, len(value) AS prefix_len
          |  FROM rgrp g JOIN rsel s ON s.host = g.host AND s.grp = g.grp
          |  WHERE dir IN ('allow', 'disallow') AND value <> ''
          |    AND g.grp > 0
          |), uu AS MATERIALIZED (
          |  SELECT doc_id, url,
          |    lower(regexp_replace(regexp_replace(
          |      regexp_extract(regexp_replace(trim(url), '#.*$', ''),
          |        '^(?i)https?://([^/?#]*)', 1),
          |      '^[^@]*@', ''), ':[0-9]*$', '')) AS host,
          |    CASE WHEN regexp_extract(url,
          |        '^(?i)https?://[^/?#]*([^#]*)', 1) <> ''
          |      THEN regexp_extract(url,
          |        '^(?i)https?://[^/?#]*([^#]*)', 1)
          |      ELSE '/' END AS pathq
          |  FROM (
          |    SELECT doc_id, 'https://' || source || '.example.com' ||
          |      (['/public/x', '/public/archive/y', '/tmp/z', '/ok',
          |        ''])[(doc_id % 5 + 1)] AS url
          |    FROM documents)
          |), rkeys AS (
          |  SELECT DISTINCT host, pathq FROM uu WHERE host IS NOT NULL
          |), rcand AS (
          |  SELECT k.host, k.pathq, r.allow, r.prefix, r.prefix_len
          |  FROM rkeys k JOIN rl r ON r.host = k.host
          |    AND starts_with(k.pathq, r.prefix)
          |), rwin AS (
          |  SELECT host, pathq, allow, prefix FROM (
          |    SELECT *, row_number() OVER (PARTITION BY host, pathq
          |      ORDER BY prefix_len DESC, allow DESC, prefix DESC)
          |      AS rn FROM rcand)
          |  WHERE rn = 1
          |)
          |SELECT u.doc_id, u.url, u.host,
          |  coalesce(w.allow, TRUE) AS allowed, w.prefix AS rule_prefix
          |FROM uu u LEFT JOIN rwin w
          |  ON w.host = u.host AND w.pathq = u.pathq""".stripMargin,

      // URL canonicalization replicated step-for-step: same regex
      // parse, same userinfo/port/www/fragment handling, same
      // tracking-param filter + survivor sort, same trailing-slash
      // and eTLD+1 rules (lists interpolated from the operator)
      "q_url_canon" ->
        (s"""WITH u AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 7 = 3
          |      THEN 'not a url ' || CAST(doc_id AS VARCHAR)
          |      ELSE 'HTTPS://user:pw@WWW.' || source ||
          |        '.Example.CO.UK:443/Path/' || CAST(doc_id AS VARCHAR)
          |        || '/?utm_source=news&b=2&A=1&gclid=xyz&keep#frag'
          |    END AS url
          |  FROM documents
          |), p AS (
          |  SELECT doc_id, url,
          |    regexp_replace(trim(url), '#.*$$', '') AS t
          |  FROM u
          |), f AS (
          |  SELECT doc_id, url, t,
          |    regexp_matches(t, '^(?i)https?://[^/?#]+') AS ok,
          |    lower(regexp_extract(t, '^([A-Za-z]+)://', 1)) AS scheme,
          |    lower(regexp_replace(regexp_replace(
          |      regexp_extract(t, '^(?i)https?://([^/?#]*)', 1),
          |      '^[^@]*@', ''), ':[0-9]*$$', '')) AS host0,
          |    regexp_extract(t, '^(?i)https?://[^/?#]*(:[0-9]+)', 1)
          |      AS port,
          |    regexp_extract(t, '^(?i)https?://[^/?#]*([^?#]*)', 1)
          |      AS path0,
          |    regexp_extract(t, '\\?([^#]*)', 1) AS query0
          |  FROM p
          |), g AS (
          |  SELECT doc_id, url, ok, scheme, host0, port,
          |    regexp_replace(host0, '^www\\.', '') AS host1,
          |    CASE WHEN path0 = '' THEN '/'
          |         WHEN path0 <> '/' THEN regexp_replace(path0, '/$$', '')
          |         ELSE path0 END AS path,
          |    array_to_string(list_sort(list_filter(
          |      string_split(query0, '&'), x -> x <> ''
          |        AND NOT starts_with(
          |          lower(regexp_extract(x, '^([^=]*)', 1)), 'utm_')
          |        AND NOT list_contains([$urlTrackingSql],
          |          lower(regexp_extract(x, '^([^=]*)', 1))))), '&')
          |      AS q,
          |    string_split(host0, '.') AS hl
          |  FROM f
          |)
          |SELECT doc_id, url,
          |  CASE WHEN ok THEN scheme || '://' || host1 ||
          |    (CASE WHEN port <> ''
          |       AND NOT (scheme = 'http' AND port = ':80')
          |       AND NOT (scheme = 'https' AND port = ':443')
          |     THEN port ELSE '' END) || path ||
          |    (CASE WHEN q <> '' THEN '?' || q ELSE '' END)
          |  END AS url_canon,
          |  CASE WHEN ok AND host0 <> '' THEN host0 END AS host,
          |  CASE WHEN ok AND host0 <> '' THEN
          |    CASE WHEN len(hl) <= 2
          |           OR regexp_matches(hl[-1], '^[0-9]+$$') THEN host0
          |         WHEN list_contains([$urlSuffixesSql],
          |             hl[-2] || '.' || hl[-1]) AND len(hl) >= 3
          |           THEN hl[-3] || '.' || hl[-2] || '.' || hl[-1]
          |         ELSE hl[-2] || '.' || hl[-1] END
          |  END AS domain
          |FROM g""").stripMargin,

      // sitemap files rebuilt byte-for-byte, then the same block walk
      // (index vs urlset), positional unnest, and per-field chain
      "q_url_sitemap" ->
        (s"""WITH files AS (
          |  SELECT source || '.example.com' AS host,
          |    CASE WHEN doc_id % 5 = 0 THEN
          |      '<?xml version="1.0"?><sitemapindex><sitemap><loc>'
          |      || 'https://' || source || '.example.com/sitemap-'
          |      || CAST(doc_id AS VARCHAR)
          |      || '-1.xml</loc><lastmod>2026-02-01</lastmod>'
          |      || '</sitemap><sitemap><loc>'
          |      || 'https://' || source || '.example.com/sitemap-'
          |      || CAST(doc_id AS VARCHAR)
          |      || '-2.xml</loc></sitemap></sitemapindex>'
          |    ELSE
          |      '<?xml version="1.0"?><urlset><url><loc>'
          |      || 'https://' || source || '.example.com/p/'
          |      || CAST(doc_id AS VARCHAR)
          |      || '?a=1&amp;b=2</loc><lastmod>2026-01-'
          |      || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
          |      || '</lastmod><changefreq>WEEKLY</changefreq>'
          |      || '<priority>0.8</priority></url>'
          |      || '<url><loc> <![CDATA[https://' || source
          |      || '.example.com/raw/' || CAST(doc_id AS VARCHAR)
          |      || ']]> </loc></url><url><loc>'
          |      || 'https://' || source || '.example.com/x/'
          |      || CAST(doc_id AS VARCHAR)
          |      || '</loc><priority>bogus</priority></url></urlset>'
          |    END AS xml
          |  FROM documents
          |), b AS (
          |  SELECT host,
          |    CASE WHEN contains(xml, '<sitemapindex')
          |      THEN 'sitemap' ELSE 'url' END AS kind,
          |    CASE WHEN contains(xml, '<sitemapindex')
          |      THEN regexp_extract_all(xml,
          |             '(?s)<sitemap>(.*?)</sitemap>', 1)
          |      ELSE regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1)
          |    END AS blocks
          |  FROM files
          |), e AS (
          |  SELECT host, kind, CAST(i AS INT) AS pos,
          |    blocks[i + 1] AS blk
          |  FROM b, unnest(range(CAST(len(blocks) AS BIGINT))) AS t(i)
          |), x AS (
          |  SELECT host, kind, pos,
          |    ${sitemapFieldSql("blk", "loc")} AS loc,
          |    ${sitemapFieldSql("blk", "lastmod")} AS lastmod,
          |    lower(${sitemapFieldSql("blk", "changefreq")})
          |      AS changefreq,
          |    ${sitemapFieldSql("blk", "priority")} AS prio
          |  FROM e
          |)
          |SELECT host, kind, pos, loc, lastmod, changefreq,
          |  CASE WHEN regexp_matches(prio, '^[0-9]+(\\.[0-9]+)?$$')
          |    THEN CAST(prio AS DOUBLE) END AS priority
          |FROM x""").stripMargin,

      // ground truth of the planted freshness hints: the changefreq
      // period map, day-granular lastmod epochs, and the due rule
      // stated directly (the parse itself is oracled by q_url_sitemap)
      "q_url_recrawl" ->
        """WITH p AS (
          |  SELECT doc_id, source,
          |    source || '.example.com' AS host,
          |    'https://' || source || '.example.com' AS base,
          |    ['always','hourly','daily','weekly','monthly','yearly',
          |     'never','sometimes'][CAST(doc_id % 8 + 1 AS INT)] AS cf,
          |    '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR),
          |      2, '0') AS lm
          |  FROM documents
          |), u1 AS (
          |  SELECT host,
          |    base || '/p/' || CAST(doc_id AS VARCHAR) AS loc,
          |    CAST(NULL AS DOUBLE) AS priority,
          |    CAST(CASE cf WHEN 'always' THEN 300
          |      WHEN 'hourly' THEN 3600 WHEN 'daily' THEN 86400
          |      WHEN 'weekly' THEN 604800 WHEN 'monthly' THEN 2592000
          |      WHEN 'yearly' THEN 31536000 WHEN 'never' THEN NULL
          |      ELSE 604800 END AS BIGINT) AS period_s,
          |    CAST(CAST(lm AS DATE) - DATE '1970-01-01' AS BIGINT)
          |      * 86400 AS lme
          |  FROM p
          |)
          |SELECT host, loc, priority, period_s,
          |  lme + period_s AS next_due_epoch,
          |  CASE WHEN period_s IS NULL THEN FALSE
          |    ELSE lme + period_s <= 1769904000 END AS due
          |FROM u1
          |UNION ALL
          |SELECT host,
          |  base || '/n/' || CAST(doc_id AS VARCHAR),
          |  CAST(NULL AS DOUBLE), CAST(604800 AS BIGINT),
          |  CAST(NULL AS BIGINT), TRUE
          |FROM p""".stripMargin,

      // same per-host window: priority DESC NULLS LAST + url
      // tie-break, per-host delay coalesced to the default, round
      // budget of 15
      "q_crawl_frontier" ->
        """WITH u AS (
          |  SELECT source || '.example.com' AS host,
          |    'https://' || source || '.example.com/p/'
          |      || CAST(doc_id AS VARCHAR) AS url,
          |    CASE WHEN doc_id % 4 <> 0 THEN
          |      CAST(doc_id % 10 AS DOUBLE) / CAST(10.0 AS DOUBLE)
          |    END AS priority,
          |    CASE WHEN CAST(substring(source, 4, 10) AS INT) % 2 = 1
          |      THEN 2000 END AS delay_ms
          |  FROM documents
          |), r AS (
          |  SELECT host, url,
          |    row_number() OVER (PARTITION BY host
          |      ORDER BY priority DESC NULLS LAST, url ASC) AS rank,
          |    coalesce(delay_ms, 1000) AS d
          |  FROM u
          |)
          |SELECT host, url, CAST(rank AS INT) AS rank,
          |  CAST((rank - 1) * d AS BIGINT) AS fetch_offset_ms
          |FROM r WHERE rank <= 15""".stripMargin,

      // normalization replicated end-to-end: same planted noise (all
      // chr()-spelled), the derived mojibake replace chain, DuckDB's
      // own nfc_normalize for the NFC step, then the same CR-fold /
      // control-strip / space-fold / zero-width-strip regex chain
      "q_text_normalize" ->
        (s"""WITH noisy AS (
          |  SELECT doc_id,
          |    'caf' || chr(101) || chr(769) || ' menu ' || chr(8212) ||
          |    ' ' || text || ' tail: ' ||
          |    chr(226) || chr(8364) || chr(8482) || 'quoted' ||
          |    chr(226) || chr(8364) || chr(8482) || chr(7) ||
          |    chr(160) || 'end' || chr(8203) AS t0
          |  FROM documents
          |), rep AS (
          |  SELECT doc_id, t0, $mojibakeRepairedSql AS t1 FROM noisy
          |), norm AS (
          |  SELECT doc_id, t0,
          |    regexp_replace(
          |    regexp_replace(
          |    regexp_replace(
          |      replace(replace(nfc_normalize(t1),
          |        chr(13) || chr(10), chr(10)), chr(13), chr(10)),""" +
          """
          |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g'),
          |      '[\xA0\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}""" +
          """\x{3000}]', ' ', 'g'),
          |      '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g') AS text_norm
          |  FROM rep
          |)
          |SELECT doc_id, text_norm,
          |  text_norm IS DISTINCT FROM t0 AS changed
          |FROM norm""").stripMargin,

      // segmentation chain replicated step-for-step: the same seeded
      // prefix, the generated abbreviation-protect replace chain, both
      // decimal-protect passes, the boundary mark, split + restore
      "q_text_sentences" ->
        (s"""WITH pre AS (
          |  SELECT doc_id, '$sentencePrefix' || text AS text
          |  FROM documents
          |), a AS (
          |  SELECT doc_id, ${sentArraySql("text")} AS sents FROM pre
          |)
          |SELECT doc_id, CAST(i AS INT) AS sent_id,
          |  sents[i + 1] AS sentence
          |FROM a, unnest(range(CAST(len(sents) AS BIGINT))) AS t(i)"""
          ).stripMargin,

      // same seeded corpus, same whitespace words / rule-split
      // sentences / vowel-group syllables; score literals ::DOUBLE-cast
      // (DuckDB literals are DECIMAL), integer-scale display rounding
      "q_text_readability" ->
        (s"""WITH pre AS (
          |  SELECT doc_id, '$sentencePrefix' || text AS text
          |  FROM documents
          |), f AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
          |      w -> w <> '') AS words,
          |    ${sentArraySql("text")} AS sents
          |  FROM pre
          |), c AS (
          |  SELECT doc_id,
          |    CAST(len(words) AS BIGINT) AS n_words,
          |    CAST(greatest(1, len(sents)) AS BIGINT) AS n_sentences,
          |    CAST(coalesce(list_sum(list_transform(words, w ->
          |      greatest(1, len(regexp_extract_all(lower(w),
          |        '[aeiouy]+'))))), 0) AS BIGINT) AS n_syllables
          |  FROM f
          |), r AS (
          |  SELECT doc_id, n_words, n_sentences, n_syllables,
          |    CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
          |      AS wps,
          |    CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
          |      AS spw
          |  FROM c
          |)
          |SELECT doc_id, n_words, n_sentences, n_syllables,
          |  CASE WHEN n_words > 0 THEN
          |    round((206.835::DOUBLE - 1.015::DOUBLE * wps
          |      - 84.6::DOUBLE * spw) * CAST(1e6 AS DOUBLE))::DOUBLE
          |      / CAST(1e6 AS DOUBLE) END AS flesch,
          |  CASE WHEN n_words > 0 THEN
          |    round((0.39::DOUBLE * wps + 11.8::DOUBLE * spw
          |      - 15.59::DOUBLE) * CAST(1e6 AS DOUBLE))::DOUBLE
          |      / CAST(1e6 AS DOUBLE) END AS fk_grade
          |FROM r""").stripMargin,

      // BPE training replicated round-by-round: each unrolled round
      // counts pairs from w{k}, picks the top one (count desc, pair asc
      // — trainBpe's tie-break), and applies it with the same greedy
      // left-to-right fold (list_reduce over a space-delimited string
      // accumulator: DuckDB's fold can't accumulate lists, and the
      // space delimiter makes the trailing-symbol check exact)
      "q_text_bpe" -> bpeOracleSql(6),

      // train + encode composed: same unrolled rounds, token key kept,
      // final vocab frame joined back to the held split's ordered words
      "q_text_bpe_encode" -> bpeEncodeOracleSql(6, "doc_id % 10 = 0"),

      // persisted-model paths: the stored artifact must reproduce the
      // in-session encoder exactly, so each reuses its encode oracle
      // verbatim
      "q_text_bpe_stored" -> bpeEncodeOracleSql(6, "doc_id % 10 = 0"),

      "q_text_bpe_bytes" -> bpeBytesEncodeOracleSql(6, "doc_id % 10 = 0"),

      // same two-level counts, same heap-equivalent ORDER BY/LIMIT
      // top-cut sums, same (tf desc, token) tie-break
      "q_text_coverage" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
          |  FROM documents),
          |per AS (
          |  SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
          |c AS MATERIALIZED (
          |  SELECT token, CAST(sum(c) AS BIGINT) AS tf FROM per
          |  GROUP BY 1),
          |t AS (SELECT CAST(sum(tf) AS BIGINT) AS tot FROM c),
          |k1 AS (SELECT CAST(sum(tf) AS BIGINT) AS cov,
          |  CAST(count(*) AS BIGINT) AS n FROM
          |  (SELECT tf FROM c ORDER BY tf DESC, token LIMIT 10)),
          |k2 AS (SELECT CAST(sum(tf) AS BIGINT) AS cov,
          |  CAST(count(*) AS BIGINT) AS n FROM
          |  (SELECT tf FROM c ORDER BY tf DESC, token LIMIT 100)),
          |k3 AS (SELECT CAST(sum(tf) AS BIGINT) AS cov,
          |  CAST(count(*) AS BIGINT) AS n FROM
          |  (SELECT tf FROM c ORDER BY tf DESC, token LIMIT 1000))
          |SELECT CAST(10 AS INT) AS cut, n AS n_tokens,
          |  round(CAST(cov AS DOUBLE) / CAST(tot AS DOUBLE)
          |    * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |    AS coverage
          |FROM k1 CROSS JOIN t
          |UNION ALL
          |SELECT CAST(100 AS INT), n,
          |  round(CAST(cov AS DOUBLE) / CAST(tot AS DOUBLE)
          |    * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |FROM k2 CROSS JOIN t
          |UNION ALL
          |SELECT CAST(1000 AS INT), n,
          |  round(CAST(cov AS DOUBLE) / CAST(tot AS DOUBLE)
          |    * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |FROM k3 CROSS JOIN t""".stripMargin,

      // the three guarded Harman rules as a CASE, then the vocab
      // count/rank shape over the stems
      "q_text_stem" ->
        """WITH tok AS (
          |  SELECT doc_id, lower(unnest(string_split(text, ' '))) AS w
          |  FROM documents),
          |st AS (
          |  SELECT doc_id,
          |    CASE WHEN ends_with(w, 'ies') THEN
          |           CASE WHEN ends_with(w, 'eies')
          |                  OR ends_with(w, 'aies') THEN w
          |                ELSE substr(w, 1, len(w) - 3) || 'y' END
          |         WHEN ends_with(w, 'es') THEN
          |           CASE WHEN ends_with(w, 'aes')
          |                  OR ends_with(w, 'ees')
          |                  OR ends_with(w, 'oes') THEN w
          |                ELSE substr(w, 1, len(w) - 1) END
          |         WHEN ends_with(w, 's') THEN
          |           CASE WHEN ends_with(w, 'us')
          |                  OR ends_with(w, 'ss') THEN w
          |                ELSE substr(w, 1, len(w) - 1) END
          |         ELSE w END AS stem
          |  FROM tok),
          |per AS (
          |  SELECT stem, doc_id, count(*) AS c FROM st GROUP BY 1, 2),
          |agg AS (
          |  SELECT stem, CAST(sum(c) AS BIGINT) AS tf,
          |         count(*) AS df FROM per GROUP BY 1)
          |SELECT stem, tf, df,
          |  CAST(row_number() OVER (ORDER BY tf DESC, stem) AS INT)
          |    AS rank
          |FROM agg ORDER BY tf DESC, stem LIMIT 20""".stripMargin,

      "q_text_vocab" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
          |  FROM documents),
          |per AS (
          |  SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
          |agg AS (
          |  SELECT token, CAST(sum(c) AS BIGINT) AS tf,
          |         count(*) AS df FROM per GROUP BY 1)
          |SELECT token, tf, df,
          |  CAST(row_number() OVER (ORDER BY tf DESC, token) AS INT) AS rank
          |FROM agg ORDER BY tf DESC, token LIMIT 20""".stripMargin,

      // identical substring enumeration, weighting, and tie-break
      "q_text_pieces" ->
        s"""WITH $piecesVocabCte
           |SELECT piece, weight,
           |  CAST(row_number() OVER (ORDER BY weight DESC, piece)
           |    AS INT) AS rank
           |FROM vocab""".stripMargin,

      // greedy longest-match replayed step-for-step (recursive CTE)
      "q_text_pieces_encode" -> piecesEncodeOracleSql,

      "q_text_pieces_stored" -> piecesEncodeOracleSql,

      // same ranked head, same round(9)-DECIMAL regression terms, same
      // double least-squares shape
      "q_text_zipf" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
          |  FROM documents),
          |per AS (
          |  SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
          |agg AS (
          |  SELECT token, CAST(sum(c) AS BIGINT) AS tf FROM per
          |  GROUP BY 1),
          |head AS (
          |  SELECT tf, row_number() OVER (ORDER BY tf DESC, token)
          |    AS rank
          |  FROM agg ORDER BY tf DESC, token LIMIT 200),
          |terms AS (
          |  SELECT
          |    CAST(round(ln(rank::DOUBLE), 9) AS DECIMAL(28,9)) AS x,
          |    CAST(round(ln(tf::DOUBLE), 9) AS DECIMAL(28,9)) AS y,
          |    CAST(round(ln(rank::DOUBLE) * ln(tf::DOUBLE), 9)
          |      AS DECIMAL(28,9)) AS xy,
          |    CAST(round(ln(rank::DOUBLE) * ln(rank::DOUBLE), 9)
          |      AS DECIMAL(28,9)) AS xx,
          |    CAST(round(ln(tf::DOUBLE) * ln(tf::DOUBLE), 9)
          |      AS DECIMAL(28,9)) AS yy
          |  FROM head),
          |s AS (
          |  SELECT count(*)::DOUBLE AS n,
          |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
          |    CAST(sum(xy) AS DOUBLE) AS sxy,
          |    CAST(sum(xx) AS DOUBLE) AS sxx,
          |    CAST(sum(yy) AS DOUBLE) AS syy
          |  FROM terms)
          |SELECT n::BIGINT AS n_fit,
          |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
          |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
          |        / n, 6) AS intercept,
          |  CASE WHEN n * syy - sy * sy <> 0 THEN
          |    round((n * sxy - sx * sy) * (n * sxy - sx * sy)
          |          / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
          |  END AS r2
          |FROM s""".stripMargin,

      // strided window replica: starts 0, 32, 64, ... (stride =
      // maxTokens - overlap), inclusive list slicing both sides
      "q_text_chunks" ->
        """WITH wl AS (
          |  SELECT doc_id AS id, string_split(text, ' ') AS w
          |  FROM documents
          |), st AS (
          |  SELECT id, w, CAST(i AS INT) AS s, CAST(i / 32 AS INT)
          |           AS chunk_id
          |  FROM wl, unnest(range(0,
          |         CAST(greatest(len(w) - 1, 0) + 1 AS BIGINT), 32))
          |       AS t(i)
          |)
          |SELECT id, chunk_id,
          |  CAST(len(w[s + 1 : s + 40]) AS INT) AS n_tokens,
          |  array_to_string(w[s + 1 : s + 40], ' ') AS chunk
          |FROM st""".stripMargin,

      // the jsonl round-trip must reproduce the parquet source exactly
      "q_source_jsonl" ->
        "SELECT doc_id, text, lang, source, n_chars FROM documents",

      "q_source_csv" ->
        "SELECT doc_id, text, lang, source, n_chars FROM documents",

      "q_source_orc" ->
        "SELECT doc_id, text, lang, source, n_chars FROM documents",

      "q_source_avro" ->
        "SELECT event_id, ts, user_id, event_type, value FROM events",

      // ground truth of the planted records, stated directly: the
      // engine's length-driven walk must recover exactly these fields
      // (incl. the metadata payload with the embedded fake header)
      "q_source_warc" ->
        """WITH p AS (
          |  SELECT doc_id, text,
          |    'note WARC/1.0' || chr(13) || chr(10) ||
          |      'Content-Length: 3' || chr(13) || chr(10) ||
          |      chr(13) || chr(10) || 'xyz tail of ' ||
          |      CAST(doc_id AS VARCHAR) AS payload2,
          |    'https://' || source || '.example.com/p/' ||
          |      CAST(doc_id AS VARCHAR) AS uri,
          |    '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR),
          |      2, '0') || 'T00:00:00Z' AS dt
          |  FROM documents
          |)
          |SELECT doc_id, CAST(0 AS INT) AS rec_id,
          |  '1.0' AS warc_version, 'response' AS warc_type,
          |  uri AS target_uri, dt AS warc_date,
          |  CAST(strlen(text) AS BIGINT) AS content_length,
          |  text AS payload
          |FROM p
          |UNION ALL
          |SELECT doc_id, CAST(1 AS INT), '1.0', 'metadata',
          |  NULL, NULL, CAST(strlen(payload2) AS BIGINT), payload2
          |FROM p""".stripMargin,

      // gz-chain ground truth, stated directly: gunzip + byte walk +
      // HTTP split + the charset trial chain must recover exactly
      // these fields (v=0 declared-utf-8, v=1 declared-latin-1, v=2
      // undeclared cp1252 fallback; metadata record passes through
      // whole with null HTTP fields; the garbage tail vanished)
      "q_source_warc_gz" ->
        """WITH p AS (
          |  SELECT doc_id, text, doc_id % 3 AS v,
          |    regexp_replace(text, '[^\x20-\x7e]', '', 'g') AS atext,
          |    'https://' || source || '.example.com/p/' ||
          |      CAST(doc_id AS VARCHAR) AS uri
          |  FROM documents
          |)
          |SELECT doc_id, CAST(0 AS INT) AS rec_id,
          |  'response' AS warc_type, uri AS target_uri,
          |  CAST(200 AS INT) AS http_status,
          |  'text/html' AS content_type,
          |  CASE v WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
          |    ELSE 'windows-1252' END AS charset,
          |  CASE WHEN v = 0 THEN text || ' café №7'
          |    ELSE atext || ' café' END AS body
          |FROM p
          |UNION ALL
          |SELECT doc_id, CAST(1 AS INT), 'metadata', NULL, NULL, NULL,
          |  'utf-8', 'fetch-ms: ' || CAST(doc_id AS VARCHAR)
          |FROM p""".stripMargin,

      // file-reader replica: the planted per-bucket record layout
      // restated — rec_id is each doc's 0-based doc_id rank within
      // its bucket file
      "q_source_warc_files" ->
        """WITH p AS (
          |  SELECT doc_id,
          |    'w' || CAST(doc_id % 4 AS VARCHAR) || '.warc.gz' AS file,
          |    'https://' || source || '.example.com/p/' ||
          |      CAST(doc_id AS VARCHAR) AS uri,
          |    'doc:' || CAST(doc_id AS VARCHAR) AS payload
          |  FROM documents
          |)
          |SELECT file,
          |  CAST(row_number() OVER (PARTITION BY file ORDER BY doc_id)
          |    - 1 AS INT) AS rec_id,
          |  'resource' AS warc_type, uri AS target_uri,
          |  CAST(length(payload) AS BIGINT) AS content_length, payload
          |FROM p""".stripMargin,

      // tf-idf replica: same two-level counts, same single ln and
      // multiply (both IEEE), ranking on the rounded score both sides
      "q_text_keywords" ->
        """WITH per AS (
          |  SELECT id, token, CAST(count(*) AS BIGINT) AS tf
          |  FROM (SELECT doc_id AS id,
          |          unnest(string_split(text, ' ')) AS token
          |        FROM documents)
          |  WHERE token <> '' GROUP BY 1, 2
          |), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
          |wdf AS (
          |  SELECT id, token, tf,
          |    CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df
          |  FROM per
          |), scored AS (
          |  SELECT id, token, tf, df,
          |    round(tf * ln(n.n / df), 6) AS tfidf
          |  FROM wdf, n
          |), ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY id
          |      ORDER BY tfidf DESC, token) AS rank
          |  FROM scored
          |)
          |SELECT id, CAST(rank AS INT) AS rank, token, tf, df, tfidf
          |FROM ranked WHERE rank <= 3""".stripMargin,

      // PMI replica: identical probability ratios and ln shape, the
      // count floor applied before the unigram joins, rank on the
      // rounded score with (w1, w2) tie-break
      "q_text_pmi" ->
        """WITH wl AS (SELECT string_split(text, ' ') AS w FROM documents),
          |bg AS (
          |  SELECT w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2,
          |    CAST(count(*) AS BIGINT) AS pair_count
          |  FROM wl, unnest(range(1, CAST(len(w) AS BIGINT))) AS t(i)
          |  WHERE w[CAST(i AS INT)] <> '' AND w[CAST(i + 1 AS INT)] <> ''
          |  GROUP BY 1, 2
          |), ug AS (
          |  SELECT tok, CAST(count(*) AS BIGINT) AS c
          |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
          |        FROM documents)
          |  WHERE tok <> '' GROUP BY 1
          |), tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tt FROM ug),
          |tp AS (SELECT CAST(sum(pair_count) AS DOUBLE) AS tp FROM bg),
          |scored AS (
          |  SELECT b.w1, b.w2, b.pair_count,
          |    round(ln((b.pair_count / tp.tp) /
          |      ((u1.c / tot.tt) * (u2.c / tot.tt))), 6) AS pmi
          |  FROM bg b JOIN ug u1 ON u1.tok = b.w1
          |    JOIN ug u2 ON u2.tok = b.w2, tot, tp
          |  WHERE b.pair_count >= 5
          |)
          |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2)
          |         AS INT) AS rank,
          |       w1, w2, pair_count, pmi
          |FROM scored
          |QUALIFY rank <= 20""".stripMargin,

      // exact-regime MG summary (capacity >= vocabulary): every count
      // is the true count and max_err is 0, so a plain per-group
      // count(*) + rank replicates the sketch output exactly
      "q_text_heavyhitters" ->
        """WITH tok AS (
          |  SELECT lang, unnest(string_split(text, ' ')) AS term
          |  FROM documents),
          |agg AS (
          |  SELECT lang, term, CAST(count(*) AS BIGINT) AS count_lb
          |  FROM tok GROUP BY 1, 2),
          |ranked AS (
          |  SELECT lang, term, count_lb,
          |    CAST(row_number() OVER (PARTITION BY lang
          |      ORDER BY count_lb DESC, term) AS INT) AS rank
          |  FROM agg)
          |SELECT lang, rank, term, count_lb, CAST(0 AS BIGINT) AS max_err
          |FROM ranked WHERE rank <= 10""".stripMargin,

      // KMV distinct estimator replicated exactly: k-th smallest
      // distinct MD5-48bit hash per group, estimate = (k-1)*2^48/h_(k)
      // — each operand one BIGINT->DOUBLE rounding then one IEEE
      // division, matching the sketch's arithmetic bit-for-bit
      "q_text_distinct" ->
        """WITH tok AS (
          |  SELECT lang, unnest(string_split(text, ' ')) AS token
          |  FROM documents),
          |h AS (
          |  SELECT DISTINCT lang,
          |    (('0x' || substr(md5(token), 1, 12))::BIGINT) AS hv
          |  FROM tok),
          |ranked AS (
          |  SELECT lang, hv,
          |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS r,
          |    count(*) OVER (PARTITION BY lang) AS nd
          |  FROM h)
          |SELECT lang,
          |  CASE WHEN max(nd) < 16 THEN CAST(max(nd) AS DOUBLE)
          |       ELSE CAST(15 * 281474976710656 AS DOUBLE)
          |            / CAST(max(CASE WHEN r = 16 THEN hv END) AS DOUBLE)
          |  END AS est_distinct,
          |  CAST(LEAST(max(nd), 16) AS INTEGER) AS kept,
          |  max(nd) < 16 AS exact
          |FROM ranked GROUP BY lang""".stripMargin,

      "q_text_repetition" ->
        s"""WITH toks AS (
           |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |grams AS (
           |  SELECT doc_id, w,
           |    [array_to_string(w[i:(i+2)], ' ') FOR i IN range(1, len(w)-1)]
           |      AS g3
           |  FROM toks)
           |SELECT doc_id, len(w) AS n_words,
           |  CASE WHEN len(w) >= 1 THEN
           |    round(1 - len(list_distinct(w))::DOUBLE / len(w), 6)
           |    ELSE 0.0 END AS dup_frac_1,
           |  $dupBigramSql AS dup_frac_2,
           |  CASE WHEN len(g3) >= 1 THEN
           |    round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 6)
           |    ELSE 0.0 END AS dup_frac_3
           |FROM grams""".stripMargin,

      // same three line rules (RE2 and Java agree on this regex
      // subset), same round-6-then-compare flag
      "q_text_code" ->
        """WITH t AS (
          |  SELECT doc_id, text ||
          |    CASE WHEN doc_id % 3 = 0
          |      THEN chr(10) || '    indented continuation line'
          |      ELSE '' END ||
          |    CASE WHEN doc_id % 4 = 0
          |      THEN chr(10) || 'if (x) { y(); }' ELSE '' END ||
          |    CASE WHEN doc_id % 5 = 0
          |      THEN chr(10) || 'return value' ELSE '' END AS text2
          |  FROM documents
          |), l AS (
          |  SELECT doc_id, list_filter(string_split(text2, chr(10)),
          |    x -> len(trim(x)) > 0) AS ls
          |  FROM t
          |), c AS (
          |  SELECT doc_id, len(ls) AS n_lines,
          |    len(list_filter(ls, x ->
          |      regexp_matches(x, '^(\s{4,}|\t)') OR
          |      regexp_matches(x, '[;{}]\s*$') OR
          |      regexp_matches(x,
          |        '\b(def|class|import|return|function|const|let)\b')))
          |      AS code_lines
          |  FROM l
          |)
          |SELECT doc_id, n_lines, code_lines,
          |  CASE WHEN n_lines > 0
          |    THEN round(CAST(code_lines AS DOUBLE) / n_lines, 6)
          |  END AS code_frac,
          |  CASE WHEN n_lines > 0
          |    THEN round(CAST(code_lines AS DOUBLE) / n_lines, 6) >= 0.3
          |    ELSE false END AS is_codey
          |FROM c""".stripMargin,

      // winnow oracle: identical 48-bit md5-prefix gram hashes, and the
      // fingerprint SET depends only on window-minimum VALUES — no
      // tie-break replication needed
      "q_text_winnow" ->
        """WITH g AS (
          |  SELECT doc_id,
          |    [('0x' || substr(md5(array_to_string(w[i:(i+2)], ' ')), 1, 12))
          |       ::BIGINT FOR i IN range(1, len(w) - 1)] AS h
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
          |f AS (
          |  SELECT doc_id,
          |    CASE WHEN len(h) = 0 THEN NULL
          |         WHEN len(h) <= 4 THEN [list_min(h)]
          |         ELSE list_distinct([list_min(h[i:(i+3)])
          |                             FOR i IN range(1, len(h) - 2)])
          |    END AS fps
          |  FROM g)
          |SELECT doc_id, unnest(fps) AS fingerprint FROM f""".stripMargin,

      // overlap pairs: the winnow CTE again (fps are engine-replicable
      // md5-prefix hashes), self-joined on shared fingerprints
      "q_text_overlap" ->
        """WITH g AS (
          |  SELECT doc_id,
          |    [('0x' || substr(md5(array_to_string(w[i:(i+2)], ' ')), 1, 12))
          |       ::BIGINT FOR i IN range(1, len(w) - 1)] AS h
          |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
          |f AS (
          |  SELECT doc_id,
          |    CASE WHEN len(h) = 0 THEN NULL
          |         WHEN len(h) <= 4 THEN [list_min(h)]
          |         ELSE list_distinct([list_min(h[i:(i+3)])
          |                             FOR i IN range(1, len(h) - 2)])
          |    END AS fps
          |  FROM g),
          |fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
          |keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 100)
          |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |       count(*) AS n_shared
          |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
          |     JOIN keep k ON k.fp = a.fp
          |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

      "q_text_fingerprints" ->
        """SELECT doc_id,
          |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
          |    AS n_subwords,
          |  list_reduce(
          |    list_prepend(CAST(0 AS BIGINT),
          |      [CAST(length(t) * 31 + ord(t[1]) AS BIGINT)
          |       FOR t IN string_split(text, ' ')]),
          |    (acc, v) -> (acc * 131 + v) % 1000000007) AS roll_hash
          |FROM documents""".stripMargin,

      "q_dedup_exact" ->
        """SELECT md5(text) AS fingerprint, count(*) AS n_docs,
          |       min(doc_id) AS keeper_id
          |FROM documents GROUP BY 1""".stripMargin,

      // same distinct-name inventory, same head-noun blocking + cap;
      // the length-difference prefilter is implied by the distance
      // bound so the plain levenshtein predicate reproduces the rows
      "q_dedup_fuzzy" ->
        """WITH n AS (
          |  SELECT p_name AS s, min(p_partkey) AS name_id
          |  FROM part GROUP BY 1
          |), b AS (
          |  SELECT *, string_split(s, ' ')[-1] AS blk FROM n
          |), c AS (
          |  SELECT blk, count(*) AS bc FROM b GROUP BY 1
          |), k AS (
          |  SELECT b.* FROM b JOIN c USING (blk) WHERE bc <= 1000
          |)
          |SELECT a.name_id AS id_a, b2.name_id AS id_b,
          |  levenshtein(a.s, b2.s) AS dist
          |FROM k a JOIN k b2 ON a.blk = b2.blk
          |  AND a.name_id < b2.name_id
          |  AND levenshtein(a.s, b2.s) <= 3""".stripMargin,

      // same blocking CTEs; DuckDB's jaro_winkler_similarity IS the
      // pinned parameterization (window max/2-1, p=0.1, cap 4,
      // boost > 0.7, integer transposition halving); threshold on the
      // round-6 score, mirroring the Spark side
      "q_dedup_fuzzy_jw" ->
        """WITH n AS (
          |  SELECT p_name AS s, min(p_partkey) AS name_id
          |  FROM part GROUP BY 1
          |), b AS (
          |  SELECT *, string_split(s, ' ')[-1] AS blk FROM n
          |), c AS (
          |  SELECT blk, count(*) AS bc FROM b GROUP BY 1
          |), k AS (
          |  SELECT b.* FROM b JOIN c USING (blk) WHERE bc <= 1000
          |)
          |SELECT a.name_id AS id_a, b2.name_id AS id_b,
          |  round(jaro_winkler_similarity(a.s, b2.s), 6) AS jw
          |FROM k a JOIN k b2 ON a.blk = b2.blk
          |  AND a.name_id < b2.name_id
          |  AND round(jaro_winkler_similarity(a.s, b2.s), 6) >= 0.85
          |""".stripMargin,

      "q_dedup_passages" ->
        """WITH chunks AS (
          |  SELECT doc_id, i AS ci,
          |         array_to_string(ws[(i*10+1):((i+1)*10)], ' ') AS chunk
          |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |       unnest(range(CAST(greatest(ceil(len(ws)/10.0), 1) AS BIGINT)))
          |         AS t(i)),
          |marked AS (
          |  SELECT doc_id, ci, chunk,
          |         row_number() OVER (PARTITION BY chunk
          |                            ORDER BY doc_id, ci) = 1 AS first
          |  FROM chunks)
          |SELECT doc_id,
          |  coalesce(array_to_string(list(chunk ORDER BY ci)
          |             FILTER (first), ' '), '') AS text_deduped,
          |  count(*) FILTER (first) AS n_kept,
          |  count(*) FILTER (NOT first) AS n_dropped
          |FROM marked GROUP BY doc_id""".stripMargin,

      // stride-1 10-token shingles, corpus-first marked by a (doc, pos)
      // window per shingle text, non-first shingles unrolled to covered
      // token positions (merged spans), anti-joined against the tokens
      "q_dedup_spans" ->
        """WITH d AS (
          |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
          |  FROM documents
          |), sh AS (
          |  SELECT doc_id, i AS s,
          |         array_to_string(ws[(i+1):(i+10)], ' ') AS key
          |  FROM d, unnest(range(CAST(len(ws) - 9 AS BIGINT))) AS t(i)
          |  WHERE len(ws) >= 10
          |), marked AS (
          |  SELECT doc_id, s,
          |         row_number() OVER (PARTITION BY key
          |                            ORDER BY doc_id, s) = 1 AS first
          |  FROM sh
          |), covered AS (
          |  SELECT DISTINCT doc_id, s + j AS p
          |  FROM marked, unnest(range(10)) AS t(j)
          |  WHERE NOT first
          |), toks AS (
          |  SELECT doc_id, i AS p, ws[i+1] AS token
          |  FROM d, unnest(range(CAST(len(ws) AS BIGINT))) AS t(i)
          |), kept AS (
          |  SELECT t.doc_id, t.p, t.token
          |  FROM toks t ANTI JOIN covered c
          |    ON c.doc_id = t.doc_id AND c.p = t.p
          |), agg AS (
          |  SELECT doc_id,
          |    array_to_string(list(token ORDER BY p), ' ') AS text_deduped,
          |    count(*) AS n_kept
          |  FROM kept GROUP BY doc_id
          |)
          |SELECT d.doc_id,
          |  coalesce(a.text_deduped, '') AS text_deduped,
          |  coalesce(a.n_kept, 0) AS n_kept,
          |  len(d.ws) - coalesce(a.n_kept, 0) AS n_dropped
          |FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,

      // same chunking CTE as q_dedup_passages; boilerplate = chunk in
      // >= 3 distinct docs, dropped everywhere (no keeper)
      "q_text_boilerplate" ->
        """WITH chunks AS (
          |  SELECT doc_id, i AS ci,
          |         array_to_string(ws[(i*10+1):((i+1)*10)], ' ') AS chunk
          |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |       unnest(range(CAST(greatest(ceil(len(ws)/10.0), 1) AS BIGINT)))
          |         AS t(i)),
          |boiler AS (
          |  SELECT chunk FROM chunks
          |  GROUP BY chunk HAVING count(DISTINCT doc_id) >= 3),
          |flagged AS (
          |  SELECT c.doc_id, c.ci, c.chunk, b.chunk IS NULL AS keep
          |  FROM chunks c LEFT JOIN boiler b USING (chunk))
          |SELECT doc_id,
          |  coalesce(array_to_string(list(chunk ORDER BY ci)
          |             FILTER (keep), ' '), '') AS text_cleaned,
          |  count(*) FILTER (keep) AS n_kept,
          |  count(*) FILTER (NOT keep) AS n_dropped
          |FROM flagged GROUP BY doc_id""".stripMargin,

      "q_dedup_jaccard" -> shingleCte,

      "q_dedup_clean" ->
        s"""WITH dup_pairs AS ($shingleCte)
           |SELECT doc_id, lang, source, n_chars FROM documents
           |WHERE doc_id NOT IN (SELECT id_b FROM dup_pairs)""".stripMargin,
      // NOTE: these two gates assert corpus-specific FULL recall. Both
      // sketches have data-dependent recall (MinHash misses a pair at
      // s≈0.5 with prob (1-s²)^32 ≈ 1e-4; SimHash Hamming tracks cosine,
      // not Jaccard, so a Jaccard≥0.5 pair with Hamming>15 is legitimately
      // dropped). Equality vs the exhaustive-Jaccard oracle holds on this
      // corpus/seed and is re-measured per round; a corpus change can fail
      // the hash gate without any code bug (then compare as
      // subset + recall-bound instead).
      "q_dedup_minhash" -> shingleCte,

      // exhaustive weighted cosine with the identical tf-idf shape and
      // round(9)-DECIMAL summation — the prefix filter is engine-side
      // only and needs no replication
      // same distinct-trigram terms (tf = 1 by construction), same
      // weighting, round-9 decimal sums and double shapes; exhaustive —
      // the engine-side prefix/L2 filters never need replicating
      "q_dedup_cosine" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS w0 FROM documents
          |), terms AS (
          |  SELECT doc_id, w, count(*)::BIGINT AS tf FROM (
          |    SELECT doc_id,
          |      unnest(CASE WHEN len(w0) >= 3 THEN list_distinct(
          |        [w0[i] || ' ' || w0[i+1] || ' ' || w0[i+2]
          |         FOR i IN range(1, greatest(len(w0)-1, 1))])
          |      ELSE [] END) AS w
          |    FROM toks) t
          |  GROUP BY 1, 2
          |), wdf AS (
          |  SELECT w, count(*)::BIGINT AS df FROM terms GROUP BY 1
          |), nn AS (
          |  SELECT count(*)::DOUBLE AS n FROM documents
          |), wts AS (
          |  SELECT doc_id, t.w,
          |    t.tf::DOUBLE * ln(1 + nn.n / wdf.df::DOUBLE) AS wt
          |  FROM terms t JOIN wdf USING (w), nn
          |), n2 AS (
          |  SELECT doc_id,
          |    sum(CAST(round(wt * wt, 9) AS DECIMAL(28,9))) AS nrm2
          |  FROM wts GROUP BY 1
          |), nums AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |    sum(CAST(round(a.wt * b.wt, 9) AS DECIMAL(28,9))) AS num
          |  FROM wts a JOIN wts b ON a.w = b.w AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |)
          |SELECT id_a, id_b,
          |  round(CAST(num AS DOUBLE)
          |        / (sqrt(CAST(na.nrm2 AS DOUBLE))
          |           * sqrt(CAST(nb.nrm2 AS DOUBLE))), 6) AS cosine
          |FROM nums
          |JOIN n2 na ON na.doc_id = id_a
          |JOIN n2 nb ON nb.doc_id = id_b
          |WHERE CAST(num AS DOUBLE)
          |      / (sqrt(CAST(na.nrm2 AS DOUBLE))
          |         * sqrt(CAST(nb.nrm2 AS DOUBLE))) >= 0.7""".stripMargin,

      // exhaustive directed containment over the same shingle sets
      "q_dedup_containment" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
          |), sh AS (
          |  SELECT doc_id,
          |         CASE WHEN len(w) >= 3 THEN list_distinct(
          |           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |            FOR i IN range(1, greatest(len(w)-1, 1))])
          |         ELSE [] END AS s
          |  FROM toks
          |), pairs AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |         len(list_intersect(a.s, b.s)) AS n_common,
          |         len(a.s) AS sa
          |  FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
          |  WHERE len(a.s) > 0 AND len(b.s) > 0
          |)
          |SELECT id_a, id_b,
          |       round(n_common::DOUBLE / sa, 6) AS containment
          |FROM pairs
          |WHERE n_common::DOUBLE / sa >= 0.6""".stripMargin,
      "q_dedup_simhash" -> shingleCte,

      // incremental oracle: exhaustive Jaccard restricted to
      // corpus-side x batch-side pairs (same recall caveat as minhash)
      "q_dedup_incremental" ->
        shingleCteOn("a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0"),

      // the persisted store must reproduce the incremental join exactly
      "q_dedup_store" ->
        shingleCteOn("a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0"),

      // connected components = min reachable id, via recursive walk over
      // the symmetric edge set of the exhaustive-Jaccard pair table
      // same per-source distinct shingle sets, the same <=10-source
      // numerator cap, raw totals, identical jaccard shape
      "q_dedup_sources" ->
        """WITH toks AS (
          |  SELECT source, string_split(text, ' ') AS w FROM documents
          |), sh AS (
          |  SELECT source,
          |    unnest(CASE WHEN len(w) >= 3 THEN list_distinct(
          |      [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          |       FOR i IN range(1, greatest(len(w)-1, 1))])
          |    ELSE [] END) AS s
          |  FROM toks
          |), gs AS MATERIALIZED (
          |  SELECT DISTINCT source AS g, s AS sh FROM sh
          |), totals AS (
          |  SELECT g, CAST(count(*) AS BIGINT) AS n_sh FROM gs
          |  GROUP BY 1
          |), keep AS (
          |  SELECT sh FROM gs GROUP BY sh HAVING count(*) <= 10
          |), capped AS MATERIALIZED (
          |  SELECT gs.g, gs.sh FROM gs JOIN keep USING (sh)
          |), pairs AS (
          |  SELECT a.g AS source_a, b.g AS source_b,
          |    CAST(count(*) AS BIGINT) AS common
          |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.g < b.g
          |  GROUP BY 1, 2
          |)
          |SELECT source_a, source_b, common,
          |  ta.n_sh AS n_a, tb.n_sh AS n_b,
          |  round(CAST(common AS DOUBLE) /
          |    CAST(ta.n_sh + tb.n_sh - common AS DOUBLE)
          |    * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |    AS jaccard
          |FROM pairs
          |JOIN totals ta ON ta.g = source_a
          |JOIN totals tb ON tb.g = source_b""".stripMargin,

      "q_dedup_clusters" ->
        s"""WITH RECURSIVE pairs AS ($shingleCte),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |),
           |walk AS (
           |  SELECT src AS id, dst AS reach FROM edges
           |  UNION
           |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
           |)
           |SELECT id, least(id, min(reach)) AS cluster_id
           |FROM walk GROUP BY id""".stripMargin,

      // keep-the-best: the same recursive cluster walk, then one keeper
      // per cluster by (n_chars DESC, doc_id) and every unclustered doc
      "q_dedup_best" ->
        s"""WITH RECURSIVE pairs AS ($shingleCte),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |),
           |walk AS (
           |  SELECT src AS id, dst AS reach FROM edges
           |  UNION
           |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
           |),
           |clusters AS (
           |  SELECT id, least(id, min(reach)) AS cluster_id
           |  FROM walk GROUP BY id
           |),
           |keepers AS (
           |  SELECT doc_id, lang, source, n_chars FROM (
           |    SELECT d.doc_id, d.lang, d.source, d.n_chars,
           |      row_number() OVER (PARTITION BY c.cluster_id
           |        ORDER BY d.n_chars DESC, d.doc_id) AS rn
           |    FROM documents d JOIN clusters c ON d.doc_id = c.id)
           |  WHERE rn = 1
           |)
           |SELECT doc_id, lang, source, n_chars FROM keepers
           |UNION ALL
           |SELECT d.doc_id, d.lang, d.source, d.n_chars
           |FROM documents d
           |WHERE d.doc_id NOT IN (SELECT id FROM clusters)""".stripMargin,

      "q_dedup_embedding" ->
        """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
          |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |    CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin,

      // same planted-companion augmentation as the Spark side (double
      // math, same mix order), then exhaustive pairs at t = 0.8
      "q_dedup_embedding_t08" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), corpus AS (
          |  SELECT vec_id, e FROM v
          |  UNION ALL
          |  SELECT vec_id + 100000 AS vec_id,
          |    [e[i] + 0.2 * e[len(e)+1-i] FOR i IN range(1, len(e)+1)] AS e
          |  FROM v WHERE vec_id % 20 = 0
          |)
          |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
          |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(a.e, b.e) >= 0.8""".stripMargin,

      // cross-side exhaustive pairs: the same planted-companion corpus,
      // benchmark side = every 20th vector, corpus x bench only
      "q_sim_decontaminate" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), bench AS (
          |  SELECT vec_id, e FROM v WHERE vec_id % 20 = 0
          |), corpus AS (
          |  SELECT vec_id, e FROM v WHERE vec_id % 20 <> 0
          |  UNION ALL
          |  SELECT vec_id + 100000 AS vec_id,
          |    [e[i] + 0.2 * e[len(e)+1-i] FOR i IN range(1, len(e)+1)] AS e
          |  FROM v WHERE vec_id % 20 = 0
          |)
          |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
          |FROM corpus a CROSS JOIN bench b
          |WHERE list_cosine_similarity(a.e, b.e) >= 0.8""".stripMargin,

      // PQ oracle: replicate the lowest-id codebook init, the
      // per-subspace argmax encoding (score desc, cid desc — mirrors
      // NearestCentroid), and the ADC cosine with pinned fold orders
      // (list_reduce == the kernel's left-to-right accumulation)
      "q_sim_pq" -> pqTopKSql,

      // persisted IVF-PQ index probed at nprobe = nlist ⇒ identical to
      // pqTopK at the same codebooks (same oracle)
      "q_sim_ivfpq" -> pqTopKSql,

      // residual-encoded IVF-PQ: deterministic coarse cells (lowest-id
      // init, score = dot − |c|²/2 with ties toward the larger cell),
      // residuals r = e − µ_cell, residual codebook = the 16 lowest-id
      // residuals, per-subspace argmax encode (score DESC, cid DESC —
      // NearestCentroid's tie-break), then the SHIFTED ADC cosine: the
      // reconstruction w = µ_cell + codebook entries, scored with plain
      // left-to-right dots (PqAdcCosineShifted folds one global
      // accumulator over the whole vector, unlike the per-subspace
      // list_reduce of the raw kernel)
      "q_sim_ivfpq_residual" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
          |                         CAST(embedding AS DOUBLE[])) > 0
          |), cent AS (
          |  SELECT e AS ce, row_number() OVER (ORDER BY vec_id) - 1 AS cell
          |  FROM v ORDER BY vec_id LIMIT 16
          |), scored0 AS (
          |  SELECT v.vec_id, v.e, cent.cell, cent.ce,
          |    list_dot_product(v.e, cent.ce)
          |      - list_dot_product(cent.ce, cent.ce) / 2 AS score
          |  FROM v CROSS JOIN cent
          |), assigned AS (
          |  SELECT vec_id, e, cell, ce FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn FROM scored0)
          |  WHERE rn = 1
          |), resid AS (
          |  SELECT vec_id, e, cell, ce,
          |    [e[i] - ce[i] FOR i IN range(1, 65)] AS r
          |  FROM assigned
          |), cb AS (
          |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, r AS cr
          |  FROM resid ORDER BY vec_id LIMIT 16
          |), cbl AS (
          |  SELECT list(cr ORDER BY cid) AS cbs FROM cb
          |), codes AS (
          |  SELECT vec_id, list(cid ORDER BY j) AS code FROM (
          |    SELECT vec_id, j, cid FROM (
          |      SELECT resid.vec_id, t.j AS j, cb.cid,
          |        row_number() OVER (PARTITION BY resid.vec_id, t.j ORDER BY
          |          list_dot_product(resid.r[(t.j*8+1):((t.j+1)*8)],
          |                           cb.cr[(t.j*8+1):((t.j+1)*8)])
          |          - list_dot_product(cb.cr[(t.j*8+1):((t.j+1)*8)],
          |                             cb.cr[(t.j*8+1):((t.j+1)*8)]) / 2
          |          DESC, cb.cid DESC) AS rn
          |      FROM resid, range(8) t(j), cb)
          |    WHERE rn = 1)
          |  GROUP BY vec_id
          |), recon AS (
          |  SELECT cd.vec_id, a.cell,
          |    [a.ce[i] + cbl.cbs[cd.code[((i-1)//8)+1]+1][i]
          |     FOR i IN range(1, 65)] AS w
          |  FROM codes cd, assigned a, cbl WHERE cd.vec_id = a.vec_id
          |), scored AS (
          |  SELECT q.vec_id AS query_id, rc.vec_id AS neighbor_id,
          |    list_dot_product(q.e, rc.w)
          |      / (sqrt(list_dot_product(q.e, q.e))
          |         * sqrt(list_dot_product(rc.w, rc.w))) AS cos_raw
          |  FROM v q, recon rc
          |  WHERE q.vec_id < 10 AND q.vec_id <> rc.vec_id
          |), ranked AS (
          |  SELECT query_id, neighbor_id,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank,
          |    round(cos_raw, 6) AS cosine
          |  FROM scored
          |)
          |SELECT query_id, neighbor_id, rank, cosine
          |FROM ranked WHERE rank <= 5""".stripMargin,

      // SemDeDup oracle: replicate the deterministic centroid init (8
      // lowest-id vectors, lloydIters=0), the argmax cell assignment
      // (score = dot − |c|²/2, ties toward the larger cell — DESC, DESC
      // mirrors Spark's greatest()-struct), then keep a vector iff no
      // lower-id cellmate has cosine >= t
      "q_dedup_semantic" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), corpus AS (
          |  SELECT vec_id, e FROM v
          |  UNION ALL
          |  SELECT vec_id + 100000 AS vec_id,
          |    [e[i] + 0.2 * e[len(e)+1-i] FOR i IN range(1, len(e)+1)] AS e
          |  FROM v WHERE vec_id % 20 = 0
          |), cent AS (
          |  SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS cell
          |  FROM corpus ORDER BY vec_id LIMIT 8
          |), scored AS (
          |  SELECT c.vec_id, c.e, ct.cell,
          |    list_dot_product(c.e, ct.e) - list_dot_product(ct.e, ct.e) / 2
          |      AS score
          |  FROM corpus c CROSS JOIN cent ct
          |), assigned AS (
          |  SELECT vec_id, e, cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn FROM scored)
          |  WHERE rn = 1
          |)
          |SELECT a.vec_id AS id, a.cell::INT AS cell FROM assigned a
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM assigned b
          |  WHERE b.cell = a.cell AND b.vec_id < a.vec_id
          |    AND list_dot_product(a.e, a.e) > 0
          |    AND list_dot_product(b.e, b.e) > 0
          |    AND list_cosine_similarity(a.e, b.e) >= 0.8)""".stripMargin,

      // outlier oracle: the semDedup cell-assignment replica (lowest-id
      // centroids, dot − |c|²/2 argmax, larger-cell ties), then round-9
      // distances, DECIMAL first/second moments per cell, identical
      // double shapes for mean/std/z
      // the deterministic-init assignment, shared with the outliers /
      // residual-IVFPQ oracles (score = dot − |c|²/2, ties toward the
      // larger cell)
      "q_sim_cluster" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
          |                         CAST(embedding AS DOUBLE[])) > 0
          |), cent AS (
          |  SELECT e AS ce, row_number() OVER (ORDER BY vec_id) - 1 AS cell
          |  FROM v ORDER BY vec_id LIMIT 16
          |), scored AS (
          |  SELECT v.vec_id, cent.cell,
          |    list_dot_product(v.e, cent.ce)
          |      - list_dot_product(cent.ce, cent.ce) / 2 AS score
          |  FROM v CROSS JOIN cent
          |)
          |SELECT vec_id AS id, cell::INT AS cell FROM (
          |  SELECT *, row_number() OVER (PARTITION BY vec_id
          |    ORDER BY score DESC, cell DESC) AS rn FROM scored)
          |WHERE rn = 1""".stripMargin,

      "q_sim_outliers" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
          |                         CAST(embedding AS DOUBLE[])) > 0
          |), cent AS (
          |  SELECT e AS ce, row_number() OVER (ORDER BY vec_id) - 1 AS cell
          |  FROM v ORDER BY vec_id LIMIT 16
          |), scored AS (
          |  SELECT v.vec_id, v.e, cent.cell, cent.ce,
          |    list_dot_product(v.e, cent.ce)
          |      - list_dot_product(cent.ce, cent.ce) / 2 AS score
          |  FROM v CROSS JOIN cent
          |), assigned AS (
          |  SELECT vec_id, e, cell, ce FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn FROM scored)
          |  WHERE rn = 1
          |), d AS (
          |  SELECT vec_id, cell,
          |    round(1 - list_dot_product(e, ce)
          |      / (sqrt(list_dot_product(e, e))
          |         * sqrt(list_dot_product(ce, ce))), 9) AS dist
          |  FROM assigned
          |), stats AS (
          |  SELECT cell, count(*)::BIGINT AS n,
          |    CAST(sum(CAST(dist AS DECIMAL(18,9))) AS DOUBLE) AS s1,
          |    CAST(sum(CAST(dist AS DECIMAL(18,9))
          |             * CAST(dist AS DECIMAL(18,9))) AS DOUBLE) AS s2
          |  FROM d GROUP BY 1
          |), z AS (
          |  SELECT d.vec_id, d.cell, d.dist,
          |    s1 / n AS mean,
          |    sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0)) AS std
          |  FROM d JOIN stats USING (cell)
          |)
          |SELECT vec_id AS id, cell::INT AS cell, round(dist, 6) AS dist,
          |  round((dist - mean) / std, 6) AS z
          |FROM z WHERE std > 0 AND (dist - mean) / std > 1""".stripMargin,

      // centroid oracle: identical shape — round-9 elements, DECIMAL
      // sums (order-independent), one double division, round-6 mean,
      // unit-normalize from the ROUNDED mean
      "q_sim_centroids" ->
        """WITH v AS (
          |  SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), dims AS (
          |  SELECT label, i AS pos,
          |    CAST(sum(CAST(round(e[i], 9) AS DECIMAL(38,12))) AS DOUBLE)
          |      / count(*) AS m,
          |    count(*) AS cnt
          |  FROM v, unnest(range(1, CAST(len(e) AS BIGINT) + 1)) AS t(i)
          |  GROUP BY label, i
          |), pooled AS (
          |  SELECT label, max(cnt) AS n_vectors,
          |    [round(m, 6) FOR m IN list(m ORDER BY pos)] AS mean6
          |  FROM dims GROUP BY label
          |)
          |, cent AS (
          |  SELECT label AS key, n_vectors,
          |    CASE WHEN sqrt(list_dot_product(mean6, mean6)) > 0
          |         THEN [round(x / sqrt(list_dot_product(mean6, mean6)), 6)
          |               FOR x IN mean6]
          |         ELSE mean6 END AS centroid
          |  FROM pooled
          |)
          |SELECT key, n_vectors, i - 1 AS pos, centroid[i] AS value
          |FROM cent,
          |  unnest(range(1, CAST(len(centroid) AS BIGINT) + 1)) AS t(i)
          |""".stripMargin,

      // partial-probe IVF at the deterministic init: corpus assignment
      // is the shared lowest-id-centroid CTE; each query ranks all 16
      // cells by the SAME score (dot − |c|²/2, ties toward the larger
      // cell — NearestCentroidsTopK's order) and probes the top 4; then
      // exact cosine re-ranks within the probed cells
      "q_sim_ivf" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
          |                         CAST(embedding AS DOUBLE[])) > 0
          |), cent AS (
          |  SELECT e AS ce, row_number() OVER (ORDER BY vec_id) - 1 AS cell
          |  FROM v ORDER BY vec_id LIMIT 16
          |), scored0 AS (
          |  SELECT v.vec_id, v.e, cent.cell, cent.ce,
          |    list_dot_product(v.e, cent.ce)
          |      - list_dot_product(cent.ce, cent.ce) / 2 AS score
          |  FROM v CROSS JOIN cent
          |), assigned AS (
          |  SELECT vec_id, e, cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn FROM scored0)
          |  WHERE rn = 1
          |), probes AS (
          |  SELECT vec_id AS query_id, e AS qe, cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn
          |    FROM scored0 WHERE vec_id < 10)
          |  WHERE rn <= 4
          |), scored AS (
          |  SELECT p.query_id, a.vec_id AS neighbor_id,
          |    list_dot_product(p.qe, a.e)
          |      / (sqrt(list_dot_product(p.qe, p.qe))
          |         * sqrt(list_dot_product(a.e, a.e))) AS cos_raw
          |  FROM probes p JOIN assigned a ON a.cell = p.cell
          |  WHERE a.vec_id <> p.query_id
          |), ranked AS (
          |  SELECT query_id, neighbor_id,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank,
          |    round(cos_raw, 6) AS cosine
          |  FROM scored
          |)
          |SELECT query_id, neighbor_id, rank, cosine
          |FROM ranked WHERE rank <= 5""".stripMargin,

      // one Lloyd round replicated: assign to the lowest-id init, take
      // per-(cell, dim) decimal means (round-9 elements, DECIMAL(38,12)
      // sums, one double division — exactly trainCentroids' aggregate),
      // empty cells keep their init centroid (the coalesce), then the
      // same partial-probe pipeline as q_sim_ivf against the REFINED
      // centroids
      "q_sim_ivf_lloyd" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
          |                         CAST(embedding AS DOUBLE[])) > 0
          |), cent0 AS (
          |  SELECT e AS ce, row_number() OVER (ORDER BY vec_id) - 1 AS cell
          |  FROM v ORDER BY vec_id LIMIT 16
          |), s0 AS (
          |  SELECT v.vec_id, v.e, cent0.cell,
          |    list_dot_product(v.e, cent0.ce)
          |      - list_dot_product(cent0.ce, cent0.ce) / 2 AS score
          |  FROM v CROSS JOIN cent0
          |), a0 AS (
          |  SELECT vec_id, e, cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn FROM s0)
          |  WHERE rn = 1
          |), dims AS (
          |  SELECT cell, i AS pos,
          |    CAST(sum(CAST(round(e[i] * 1e9) AS BIGINT)) AS DOUBLE)
          |      / (1e9 * count(*)) AS m
          |  FROM a0, unnest(range(1, CAST(len(e) AS BIGINT) + 1)) AS t(i)
          |  GROUP BY cell, i
          |), refined AS (
          |  SELECT cell, list(m ORDER BY pos) AS ce FROM dims GROUP BY cell
          |), cent1 AS (
          |  SELECT cent0.cell, coalesce(refined.ce, cent0.ce) AS ce
          |  FROM cent0 LEFT JOIN refined ON refined.cell = cent0.cell
          |), s1 AS (
          |  SELECT v.vec_id, v.e, cent1.cell,
          |    list_dot_product(v.e, cent1.ce)
          |      - list_dot_product(cent1.ce, cent1.ce) / 2 AS score
          |  FROM v CROSS JOIN cent1
          |), assigned AS (
          |  SELECT vec_id, e, cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn FROM s1)
          |  WHERE rn = 1
          |), probes AS (
          |  SELECT vec_id AS query_id, e AS qe, cell FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY score DESC, cell DESC) AS rn
          |    FROM s1 WHERE vec_id < 10)
          |  WHERE rn <= 4
          |), scored AS (
          |  SELECT p.query_id, a.vec_id AS neighbor_id,
          |    list_dot_product(p.qe, a.e)
          |      / (sqrt(list_dot_product(p.qe, p.qe))
          |         * sqrt(list_dot_product(a.e, a.e))) AS cos_raw
          |  FROM probes p JOIN assigned a ON a.cell = p.cell
          |  WHERE a.vec_id <> p.query_id
          |), ranked AS (
          |  SELECT query_id, neighbor_id,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank,
          |    round(cos_raw, 6) AS cosine
          |  FROM scored
          |)
          |SELECT query_id, neighbor_id, rank, cosine
          |FROM ranked WHERE rank <= 5""".stripMargin,

      "q_sim_topk" -> exactTopKSql,

      // unrolled greedy MMR: the same top-20 candidate CTE, then one
      // (select, remaining) CTE pair per round — running max-sim via
      // greatest, ranking on the unrounded mmr, ties to lowest id;
      // multi-referenced CTEs materialized (the kCore discipline)
      "q_sim_mmr" -> mmrOracleSql(5, 20, "0.7"),

      // the exact top-k oracle with the label-inequality predicate and
      // both labels carried — the hard-negative contract
      "q_sim_negatives" ->
        """WITH scored AS (
          |  SELECT q.vec_id AS query_id, q.label AS anchor_label,
          |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
          |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
          |      CAST(c.embedding AS DOUBLE[])) AS cos_raw
          |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
          |    AND q.vec_id <> c.vec_id AND q.label <> c.label
          |), ranked AS (
          |  SELECT query_id, anchor_label, neighbor_id, neighbor_label,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos_raw DESC, neighbor_id) AS rank,
          |    round(cos_raw, 6) AS cosine
          |  FROM scored
          |)
          |SELECT query_id, anchor_label, neighbor_id, neighbor_label,
          |       rank, cosine
          |FROM ranked WHERE rank <= 5""".stripMargin,

      // numPlanes = 0 ⇒ identical to exact top-k (same oracle)
      "q_sim_ann_exact" -> exactTopKSql,

      // the two top-k oracles composed: exact rows left-join the ANN
      // rows, per-query hit counts, decimal-summed macro recall
      "q_sim_recall" ->
        (s"""WITH a AS ($annTopKSql),
          |e AS ($exactTopKSql),
          |hits AS (
          |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_truth,
          |    CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
          |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
          |  FROM e LEFT JOIN a ON a.query_id = e.query_id
          |    AND a.neighbor_id = e.neighbor_id
          |  GROUP BY 1
          |), per AS (
          |  SELECT query_id, n_truth, n_hit,
          |    round(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)
          |      * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |      AS recall,
          |    round(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 9)
          |      ::DECIMAL(38,9) AS r9
          |  FROM hits
          |)
          |SELECT query_id, n_truth, n_hit, recall,
          |  round(CAST(sum(r9) OVER () AS DOUBLE)
          |      / CAST(count(*) OVER () AS DOUBLE)
          |      * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |    AS macro_recall
          |FROM per""").stripMargin,

      // full algorithm replication: seed-42 planes as literals, sign
      // buckets (dot >= 0 per plane), query-side Hamming-1 multi-probe
      // (b0 plus each single-bit flip), exact-cosine re-rank
      // identical literal matrix, identical dot/scale/round shape
      "q_sim_reduce" ->
        s"""WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          |  FROM embeddings
          |), planes(p, hv) AS (
          |  VALUES
          |    $jlPlanesSql
          |)
          |SELECT v.vec_id, planes.p AS pos,
          |  round(list_dot_product(v.e, planes.hv) / sqrt(16.0), 6)
          |    AS value
          |FROM v CROSS JOIN planes""".stripMargin,

      "q_sim_ann" -> annTopKSql,

      // nprobe = nlist ⇒ identical to exact top-k (same oracle)
      "q_sim_ivf_exact" -> exactTopKSql,

      // persisted index probed at nprobe = nlist ⇒ exact (same oracle)
      "q_sim_ivf_indexed" -> exactTopKSql,

      "q_events_window" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
          |         AS window_start,
          |       event_type, count(*) AS n_events,
          |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
          |         AS sum_value
          |FROM events GROUP BY 1, 2""".stripMargin,

      "q_events_sessionize" ->
        """WITH gaps AS (
          |  SELECT user_id, event_id, ts,
          |    epoch(ts - lag(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) AS gap
          |  FROM events
          |), marked AS (
          |  SELECT user_id, event_id,
          |    CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_s,
          |    ts
          |  FROM gaps
          |), numbered AS (
          |  SELECT user_id, event_id,
          |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index
          |  FROM marked
          |)
          |SELECT user_id, session_index, count(*) AS n_events,
          |       min(event_id) AS first_event_id,
          |       max(event_id) AS last_event_id
          |FROM numbered GROUP BY 1, 2""".stripMargin,

      // anchored first-touch funnel, same greedy-min chain per step
      // same integer period floor-division, same distinct/first/join
      // shape; offset aliased (OFFSET is reserved)
      "q_events_retention" ->
        """WITH act AS (
          |  SELECT DISTINCT user_id AS u,
          |         epoch_us(ts) // 86400000000 AS p
          |  FROM events
          |), fs AS (
          |  SELECT u, min(p) AS cohort FROM act GROUP BY 1
          |), sizes AS (
          |  SELECT cohort, count(*)::BIGINT AS cohort_size
          |  FROM fs GROUP BY 1
          |)
          |SELECT f.cohort, a.p - f.cohort AS period_offset,
          |  count(*)::BIGINT AS n_active, s.cohort_size,
          |  round(count(*)::DOUBLE / s.cohort_size::DOUBLE, 6)
          |    AS retention
          |FROM act a JOIN fs f USING (u) JOIN sizes s ON s.cohort = f.cohort
          |GROUP BY 1, 2, 4""".stripMargin,

      // same bucket representative (last event by ts, event_id), same
      // per-user generate_series grid, same IGNORE NULLS fill windows,
      // same interpolation arithmetic shape
      "q_events_gapfill" ->
        """WITH obs0 AS (
          |  SELECT user_id AS u, epoch_us(ts) // 21600000000 AS p, value,
          |    row_number() OVER (
          |      PARTITION BY user_id, epoch_us(ts) // 21600000000
          |      ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events
          |), obs AS (SELECT u, p, value AS v FROM obs0 WHERE rn = 1),
          |b AS (SELECT u, min(p) AS pmin, max(p) AS pmax FROM obs GROUP BY 1),
          |grid AS (SELECT u, unnest(generate_series(pmin, pmax)) AS p FROM b),
          |j AS (
          |  SELECT g.u, g.p, o.v,
          |    last_value(o.v IGNORE NULLS) OVER w1 AS v_ffill,
          |    last_value(CASE WHEN o.v IS NOT NULL THEN g.p END IGNORE NULLS)
          |      OVER w1 AS pp,
          |    first_value(o.v IGNORE NULLS) OVER w2 AS nv,
          |    first_value(CASE WHEN o.v IS NOT NULL THEN g.p END IGNORE NULLS)
          |      OVER w2 AS np
          |  FROM grid g LEFT JOIN obs o ON o.u = g.u AND o.p = g.p
          |  WINDOW
          |    w1 AS (PARTITION BY g.u ORDER BY g.p
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |    w2 AS (PARTITION BY g.u ORDER BY g.p
          |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          |)
          |SELECT u AS user_id, p AS period, (v IS NOT NULL) AS observed,
          |  v_ffill,
          |  round(CASE WHEN v IS NOT NULL THEN v
          |             WHEN pp IS NOT NULL AND np IS NOT NULL THEN
          |               v_ffill + (nv - v_ffill) *
          |                 ((p - pp)::DOUBLE / (np - pp)::DOUBLE)
          |             ELSE v_ffill END, 6) AS v_interp
          |FROM j""".stripMargin,

      // same DECIMAL(18,2)-exact window sums, same strictly-prior
      // frame, same double arithmetic from the exact sums, keep
      // decision on the unrounded z
      // same per-user lag gaps (epoch-micros // 1e6 whole seconds),
      // DECIMAL moments, identical mean/sigma/B shapes
      "q_events_burstiness" ->
        """WITH g AS (
          |  SELECT user_id,
          |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (
          |      PARTITION BY user_id ORDER BY ts, event_id))
          |      // 1000000 AS g
          |  FROM events
          |), a AS (
          |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |    CAST(count(g) AS BIGINT) AS n_gaps,
          |    sum(CAST(g AS DECIMAL(38,0))) AS s1,
          |    sum(CAST(CAST(g AS DECIMAL(19,0)) * g AS DECIMAL(38,0)))
          |      AS s2
          |  FROM g GROUP BY 1
          |), f AS (
          |  SELECT user_id, n_events, n_gaps,
          |    CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean,
          |    sqrt(greatest(0.0::DOUBLE,
          |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
          |        * CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
          |      / CAST(n_gaps AS DOUBLE))) AS sd
          |  FROM a
          |)
          |SELECT user_id, n_events, n_gaps,
          |  CASE WHEN n_gaps >= 1 THEN
          |    round(mean * CAST(1e6 AS DOUBLE))::DOUBLE
          |      / CAST(1e6 AS DOUBLE) END AS mean_gap_s,
          |  CASE WHEN n_gaps >= 2 AND (sd + mean) > 0 THEN
          |    round((sd - mean) / (sd + mean) * CAST(1e6 AS DOUBLE))
          |      ::DOUBLE / CAST(1e6 AS DOUBLE) END AS burstiness
          |FROM f""".stripMargin,

      // same (type, hour) cells: round-9 decimal moments, one
      // fixed-shape mean/sd formula, flag on the unrounded doubles
      "q_events_seasonal" ->
        """WITH e AS (
          |  SELECT event_id, event_type,
          |    CAST(extract(hour FROM ts) AS INT) AS hour, value
          |  FROM events
          |), cells AS (
          |  SELECT event_type, hour, CAST(count(*) AS BIGINT) AS n_obs,
          |    sum(round(value, 9)::DECIMAL(38,9)) AS s1,
          |    sum(round(value * value, 9)::DECIMAL(38,9)) AS s2
          |  FROM e GROUP BY 1, 2
          |), m AS (
          |  SELECT event_type, hour, n_obs,
          |    CAST(s1 AS DOUBLE) / CAST(n_obs AS DOUBLE) AS mean,
          |    sqrt(greatest(0.0::DOUBLE,
          |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
          |        * CAST(s1 AS DOUBLE) / CAST(n_obs AS DOUBLE))
          |      / CAST(n_obs AS DOUBLE))) AS sd
          |  FROM cells
          |)
          |SELECT e.event_id, e.event_type, e.hour, e.value, m.n_obs,
          |  round(mean * CAST(1e6 AS DOUBLE))::DOUBLE
          |    / CAST(1e6 AS DOUBLE) AS cell_mean,
          |  round(sd * CAST(1e6 AS DOUBLE))::DOUBLE
          |    / CAST(1e6 AS DOUBLE) AS cell_sd,
          |  (m.n_obs >= 30 AND sd > 0
          |    AND abs(e.value - mean) > 3.0::DOUBLE * sd) AS is_anomaly
          |FROM e JOIN m USING (event_type, hour)""".stripMargin,

      "q_events_anomalies" ->
        """WITH t AS (
          |  SELECT user_id AS u, event_id, ts,
          |         value::DECIMAL(18,2) AS vd
          |  FROM events
          |), w AS (
          |  SELECT u, event_id, vd,
          |    count(vd) OVER fr AS n_prior,
          |    CAST(sum(vd) OVER fr AS DOUBLE) AS s1,
          |    CAST(sum(vd * vd) OVER fr AS DOUBLE) AS s2
          |  FROM t
          |  WINDOW fr AS (PARTITION BY u ORDER BY ts, event_id
          |                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
          |), z AS (
          |  SELECT u, event_id, vd, n_prior,
          |    s1 / n_prior::DOUBLE AS m,
          |    (s2 - s1 * s1 / n_prior::DOUBLE) / (n_prior - 1)::DOUBLE
          |      AS var
          |  FROM w WHERE n_prior >= 8
          |)
          |SELECT u AS user_id, event_id, vd::DOUBLE AS value, n_prior,
          |  round((vd::DOUBLE - m) / sqrt(var), 6) AS z_score
          |FROM z
          |WHERE var > 1e-12
          |  AND abs((vd::DOUBLE - m) / sqrt(var)) > 3.0""".stripMargin,

      "q_events_funnel" ->
        """WITH s1 AS (
          |  SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY 1
          |), s2 AS (
          |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
          |  WHERE e.event_type = 'click' AND e.ts > s1.t1
          |    AND e.ts <= s1.t1 + INTERVAL 1 DAY GROUP BY 1
          |), s3 AS (
          |  SELECT e.user_id, min(e.ts) AS t3
          |  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
          |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          |    AND e.ts <= s1.t1 + INTERVAL 1 DAY GROUP BY 1
          |)
          |SELECT s1.user_id,
          |  CAST(1 + (s2.user_id IS NOT NULL)::INT
          |         + (s3.user_id IS NOT NULL)::INT AS INT) AS n_steps,
          |  (s3.user_id IS NOT NULL) AS completed
          |FROM s1
          |LEFT JOIN s2 USING (user_id)
          |LEFT JOIN s3 USING (user_id)""".stripMargin,

      "q_events_range" ->
        """SELECT p.user_id, p.event_id, c.click_id
          |FROM (SELECT user_id, event_id, ts FROM events
          |      WHERE event_type = 'purchase') p
          |JOIN (SELECT user_id, event_id AS click_id, ts FROM events
          |      WHERE event_type = 'click') c
          |ON p.user_id = c.user_id
          |  AND c.ts >= p.ts - INTERVAL 1 HOUR
          |  AND c.ts <= p.ts""".stripMargin,

      "q_text_corpus" ->
        """SELECT lang, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
          |  round(quantile_cont(n_chars, 0.5), 6) AS median_chars,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
          |FROM documents GROUP BY 1""".stripMargin,

      // ROLLUP grouping sets: DuckDB's subtotal rows carry NULL in the
      // rolled-up columns exactly like Spark's
      "q_text_rollup" ->
        """SELECT lang, source, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
          |  CAST(max(n_chars) AS BIGINT) AS max_chars,
          |  CAST(sum(len(string_split(text, ' '))) AS BIGINT)
          |    AS total_tokens
          |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,

      // same hash (md5 of the decimal id string), same rank/threshold math
      "q_sample_stratified" ->
        """WITH ranked AS (
          |  SELECT doc_id, lang, source,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
          |    count(*) OVER (PARTITION BY lang) AS n
          |  FROM documents
          |)
          |SELECT doc_id, lang, source FROM ranked
          |WHERE rnk <= ceil(n * 0.2)""".stripMargin,

      // pipeline oracle: the composed CTE chain of the per-operator
      // oracles (dedup keep-min-id, dup-bigram + length gate, integer
      // split bucketing)
      "q_pipeline_curate" ->
        s"""WITH keep AS (
           |  SELECT *, row_number() OVER (PARTITION BY md5(text)
           |    ORDER BY doc_id) AS rn FROM documents),
           |gated AS (
           |  SELECT doc_id, lang, source, len(w) AS n_tokens
           |  FROM (SELECT *, string_split(text, ' ') AS w
           |        FROM keep WHERE rn = 1)
           |  WHERE len(w) >= 30 AND $dupBigramSql <= 0.05)
           |SELECT doc_id, lang, source, n_tokens,
           |  $splitCaseSql
           |FROM (
           |  SELECT *, $splitBucketSql AS b
           |  FROM gated)""".stripMargin,

      // audit oracle: each step's row count recomputed independently
      // (token_count mirrors as len(string_split), the house mapping)
      "q_pipeline_audit" ->
        """WITH t AS (
          |  SELECT len(string_split(text, ' ')) AS n FROM documents)
          |SELECT 0 AS step, 'read_table' AS op,
          |       (SELECT count(*) FROM t)::BIGINT AS n_rows
          |UNION ALL SELECT 1, 'token_count',
          |       (SELECT count(*) FROM t)::BIGINT
          |UNION ALL SELECT 2, 'filter',
          |       (SELECT count(*) FROM t WHERE n >= 30)::BIGINT
          |UNION ALL SELECT 3, 'select',
          |       (SELECT count(*) FROM t WHERE n >= 30)::BIGINT"""
          .stripMargin,

      // split oracle: same 48-bit hash prefix, same exact integer
      // scale-and-shift bucketing (>> 48), same cumulative parts
      "q_sample_split" ->
        s"""SELECT doc_id, source,
           |  $splitCaseSql
           |FROM (
           |  SELECT doc_id, source, $splitBucketSql AS b
           |  FROM documents)""".stripMargin,

      // leakage-safe split oracle: the q_dedup_clusters recursive walk
      // recovers components, then the standard 48-bit bucketing hashes
      // coalesce(cluster_id, doc_id) instead of doc_id
      "q_sample_split_safe" ->
        s"""WITH RECURSIVE pairs AS ($shingleCte),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |),
           |walk AS (
           |  SELECT src AS id, dst AS reach FROM edges
           |  UNION
           |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
           |),
           |clusters AS (
           |  SELECT id, least(id, min(reach)) AS cluster_id
           |  FROM walk GROUP BY id
           |),
           |keyed AS (
           |  SELECT d.doc_id, d.source,
           |         coalesce(c.cluster_id, d.doc_id) AS grp
           |  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id
           |)
           |SELECT doc_id, source,
           |  $splitCaseSql
           |FROM (
           |  SELECT doc_id, source,
           |    (('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 12))::BIGINT
           |     * 100) >> 48 AS b
           |  FROM keyed)""".stripMargin,

      // mixture oracle: same normalized weights, same T = min(n_d/w_d)
      // double math (LEFT JOIN keeps an absent requested domain as n=0),
      // same floor(w*T) per-domain cap, same md5 rank as stratified
      "q_sample_mixture" ->
        """WITH w AS (
          |  SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3),
          |                        ('src2', 0.2)) AS t(source, wt)),
          |n AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
          |t AS (
          |  SELECT min(coalesce(n.n, 0) / w.wt) AS total
          |  FROM w LEFT JOIN n USING (source)),
          |k AS (
          |  SELECT w.source, CAST(floor(w.wt * t.total) AS BIGINT) AS k
          |  FROM w, t),
          |ranked AS (
          |  SELECT doc_id, source, lang,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
          |  FROM documents)
          |SELECT r.doc_id, r.source, r.lang
          |FROM ranked r JOIN k USING (source) WHERE r.rnk <= k.k""".stripMargin,

      // temperature mixture: sqrt(count) weights, same floor/rank shape,
      // over the same induced-skew frame
      "q_sample_temperature" ->
        """WITH d AS (
          |  SELECT doc_id, source, lang FROM documents
          |  WHERE source = 'src0' OR doc_id % 3 = 0),
          |n AS (
          |  SELECT source, count(*) AS n FROM d GROUP BY 1),
          |w AS (SELECT source, n, sqrt(n::DOUBLE) AS wt FROM n),
          |t AS (SELECT min(n / wt) AS total FROM w),
          |k AS (
          |  SELECT w.source, CAST(floor(w.wt * t.total) AS BIGINT) AS k
          |  FROM w, t),
          |ranked AS (
          |  SELECT doc_id, source, lang,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
          |  FROM d)
          |SELECT r.doc_id, r.source, r.lang
          |FROM ranked r JOIN k USING (source) WHERE r.rnk <= k.k""".stripMargin,

      "q_sample_hash" ->
        s"""SELECT doc_id, lang FROM documents
           |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 12) <
           |  '${Curation.thresholdHex(0.3).get}'""".stripMargin,

      // same 48-bit hash fraction, same double arithmetic shape
      "q_sample_weighted" ->
        """SELECT doc_id, n_chars FROM documents
          |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
          |        ::BIGINT::DOUBLE / 281474976710656.0::DOUBLE
          |  < least(n_chars::DOUBLE / 400.0::DOUBLE, 1.0::DOUBLE)""".stripMargin,

      // the recursive cluster walk again, then 1/|cluster| weights and
      // the same weighted-hash keep rule
      "q_sample_softdedup" ->
        s"""WITH RECURSIVE pairs AS ($shingleCte),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |),
           |walk AS (
           |  SELECT src AS id, dst AS reach FROM edges
           |  UNION
           |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
           |),
           |clusters AS (
           |  SELECT id, least(id, min(reach)) AS cluster_id
           |  FROM walk GROUP BY id
           |),
           |sizes AS (
           |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
           |  FROM clusters GROUP BY 1
           |),
           |wt AS (
           |  SELECT c.id AS doc_id,
           |    1.0::DOUBLE / CAST(s.sz AS DOUBLE) AS weight
           |  FROM clusters c JOIN sizes s USING (cluster_id)
           |)
           |SELECT d.doc_id, d.lang, d.source,
           |  coalesce(wt.weight, 1.0::DOUBLE) AS weight
           |FROM documents d LEFT JOIN wt USING (doc_id)
           |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 12))
           |        ::BIGINT::DOUBLE / 281474976710656.0::DOUBLE
           |  < least(greatest(coalesce(wt.weight, 1.0::DOUBLE),
           |      0.0::DOUBLE), 1.0::DOUBLE)""".stripMargin,

      // each PageRank iteration unrolled with the identical rounding
      // discipline — see pageRankOracleSql
      "q_graph_pagerank" -> pageRankOracleSql(3, 0.85),

      // HyperBall unrolled: register max-merge along edges is set
      // union, so r_k holds exactly the k-ball's registers; the
      // estimate and the lcm-scaled harmonic sum are fixed-shape
      // (m = 16: alpha·m²·2^49 inline, linear-counting below 2.5m).
      // Per-radius deltas clamp at 0 — the estimate is not monotone
      // across the linear-counting/raw branch switch — mirroring the
      // operator's greatest(Δ, 0)
      "q_graph_harmonic" ->
        s"""$hyperBallOracleCtes
           |SELECT e0.node,
           |  CAST(6 * greatest(e1.e - e0.e, 0) +
           |       3 * greatest(e2.e - e1.e, 0) +
           |       2 * greatest(e3.e - e2.e, 0) AS DOUBLE)
           |    / 6000000.0 AS harmonic,
           |  CAST(e3.e AS DOUBLE) / 1000000.0 AS ball
           |FROM e0
           |JOIN e1 ON e1.node = e0.node
           |JOIN e2 ON e2.node = e0.node
           |JOIN e3 ON e3.node = e0.node""".stripMargin,

      // min-over-walks enumeration: walk holds every (node, path
      // weight, hop ≤ 2) triple — bounded by distinct ≤2-hop path
      // sums on the THINNED graph — and min(dist) is the shortest
      // path (walks can't beat paths at non-negative weights, and
      // both engines enumerate the same walk set anyway)
      "q_graph_sssp" ->
        """WITH RECURSIVE
          |g0 AS MATERIALIZED (
          |  SELECT CAST(l_suppkey AS BIGINT) AS src,
          |         CAST(l_partkey + 10000000 AS BIGINT) AS dst,
          |         CAST(l_quantity AS BIGINT) AS w
          |  FROM lineitem WHERE l_quantity > 45),
          |sym AS MATERIALIZED (
          |  SELECT src, dst, min(w) AS w FROM (
          |    SELECT src, dst, w FROM g0
          |    UNION ALL
          |    SELECT dst AS src, src AS dst, w FROM g0)
          |  GROUP BY 1, 2),
          |walk(node, dist, hop) AS (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS node,
          |         0::BIGINT AS dist, 0 AS hop
          |  FROM lineitem
          |  WHERE l_quantity > 45 AND l_suppkey % 17 = 0
          |  UNION
          |  SELECT e.dst AS node, w.dist + e.w AS dist,
          |         w.hop + 1 AS hop
          |  FROM walk w JOIN sym e ON e.src = w.node
          |  WHERE w.hop < 2)
          |SELECT node, CAST(min(dist) AS BIGINT) AS dist
          |FROM walk GROUP BY 1""".stripMargin,

      // closeness over the same CTE chain: radius-weighted CLAMPED
      // ΔE units in exact integer arithmetic (the same greatest(Δ, 0)
      // as the operator), the same two double divisions
      "q_graph_closeness" ->
        s"""$hyperBallOracleCtes
           |SELECT e0.node,
           |  CASE WHEN (greatest(e1.e - e0.e, 0) * 1 +
           |             greatest(e2.e - e1.e, 0) * 2 +
           |             greatest(e3.e - e2.e, 0) * 3) > 0
           |    THEN CAST(greatest(e1.e - e0.e, 0) +
           |              greatest(e2.e - e1.e, 0) +
           |              greatest(e3.e - e2.e, 0) AS DOUBLE) /
           |         CAST(greatest(e1.e - e0.e, 0) * 1 +
           |              greatest(e2.e - e1.e, 0) * 2 +
           |              greatest(e3.e - e2.e, 0) * 3 AS DOUBLE)
           |    ELSE 0.0 END AS closeness,
           |  CAST(greatest(e1.e - e0.e, 0) * 1 +
           |       greatest(e2.e - e1.e, 0) * 2 +
           |       greatest(e3.e - e2.e, 0) * 3 AS DOUBLE) / 1000000.0
           |    AS total_distance,
           |  CAST(e3.e AS DOUBLE) / 1000000.0 AS ball
           |FROM e0
           |JOIN e1 ON e1.node = e0.node
           |JOIN e2 ON e2.node = e0.node
           |JOIN e3 ON e3.node = e0.node""".stripMargin,

      // the global neighborhood function over the same CTE chain:
      // per-node estimate units sum as exact longs per radius
      "q_graph_nf" ->
        s"""$hyperBallOracleCtes,
           |t AS (
           |  SELECT 0 AS k, sum(e)::BIGINT AS units FROM e0
           |  UNION ALL SELECT 1, sum(e)::BIGINT FROM e1
           |  UNION ALL SELECT 2, sum(e)::BIGINT FROM e2
           |  UNION ALL SELECT 3, sum(e)::BIGINT FROM e3),
           |lastk AS (SELECT units AS lastu FROM t WHERE k = 3)
           |SELECT k, units::DOUBLE / 1e6 AS nf,
           |  (units::DOUBLE / 1e6) / (lastu::DOUBLE / 1e6) AS frac
           |FROM t, lastk""".stripMargin,

      // every hop replicated: the same sorted-adjacency index
      // (row_number / count windows), the same 48-bit md5 pick —
      // hash input "start|cur|k|seed", '0x'-prefixed 12-hex-char
      // cast, mod degree — so each walk position matches exactly
      "q_graph_walks" ->
        s"""${walksOracleCtes("SELECT node FROM nodes")}
          |SELECT start, step, node FROM walk""".stripMargin,

      // same hop replay from the %17 SEED slice only (the bucketed
      // element_at pick is bit-equal to the join form by the shared
      // hash grammar — spec-pinned — so one oracle covers both)
      "q_graph_walks_seeded" ->
        s"""${walksOracleCtes(
            "SELECT DISTINCT src AS node FROM g0 WHERE src % 17 = 0")}
          |SELECT start, step, node FROM walk""".stripMargin,

      // skip-gram pairs: every within-window ordered position pair
      // of every replayed walk (positions are unique per (start,
      // step), so the self-join multiplicity is exactly one)
      "q_graph_walk_pairs" ->
        s"""${walksOracleCtes("SELECT node FROM nodes")}
          |SELECT a.start, a.step AS center_step,
          |       b.step AS context_step,
          |       a.node AS center, b.node AS context
          |FROM walk a JOIN walk b
          |  ON a.start = b.start AND a.step <> b.step
          | AND abs(a.step - b.step) <= 2""".stripMargin,

      "q_graph_node2vec" -> node2vecOracleSql(3, 1, 4, "s42"),
      "q_graph_node2vec_seeded" -> node2vecOracleSql(3, 1, 4, "s42",
        "SELECT DISTINCT src AS node FROM g0 WHERE src % 17 = 0"),

      "q_graph_embeddings" ->
        embeddingsOracleSql(4, 2, 0.5, 2, "n7", "e0"),

      "q_graph_embed_loss" ->
        embeddingsOracleSql(4, 2, 0.5, 2, "n7", "e0",
          tailSql = embedLossTailSql(2)),

      // serve readout: round-6 display vectors (exactly what the
      // Spark chain assembles), exact cosine, rank ties on id
      "q_pipeline_embed_knn" ->
        embeddingsOracleSql(4, 2, 0.5, 2, "n7", "e0", tailSql =
          """, vecs AS (
            |  SELECT node, j, round(CAST(ew AS DOUBLE), 6) AS w
            |  FROM emb2),
            |norms AS (
            |  SELECT node, sqrt(SUM(w * w)) AS nrm
            |  FROM vecs GROUP BY 1),
            |cos AS (
            |  SELECT a.node AS query_id, b.node AS neighbor_id,
            |         SUM(a.w * b.w) / (na.nrm * nb.nrm) AS cosine
            |  FROM vecs a JOIN vecs b
            |    ON a.j = b.j AND a.node <> b.node
            |  JOIN norms na ON na.node = a.node
            |  JOIN norms nb ON nb.node = b.node
            |  WHERE na.nrm > 0 AND nb.nrm > 0
            |  GROUP BY a.node, b.node, na.nrm, nb.nrm)
            |SELECT query_id, neighbor_id,
            |       CAST(row_number() OVER (
            |         PARTITION BY query_id
            |         ORDER BY cosine DESC, neighbor_id) AS INT)
            |         AS rank,
            |       round(cosine, 6) AS cosine
            |FROM cos
            |QUALIFY rank <= 3""".stripMargin),

      // the same pairs, then every negative draw replayed: vocabulary
      // ranked in (md5 bucket % 256, node) order, draw j of a
      // positive = rank 1 + hash48(start|center_step|context_step|j|
      // seed) mod |V|
      "q_graph_walk_negatives" ->
        s"""${walksOracleCtes("SELECT node FROM nodes")},
          |pairs AS MATERIALIZED (
          |  SELECT a.start, a.step AS center_step,
          |         b.step AS context_step,
          |         a.node AS center, b.node AS context
          |  FROM walk a JOIN walk b
          |    ON a.start = b.start AND a.step <> b.step
          |   AND abs(a.step - b.step) <= 2),
          |vocab AS MATERIALIZED (
          |  SELECT DISTINCT node FROM (
          |    SELECT center AS node FROM pairs
          |    UNION ALL SELECT context FROM pairs)),
          |ranked AS MATERIALIZED (
          |  SELECT node, row_number() OVER (ORDER BY
          |      ('0x' || substring(md5(CAST(node AS VARCHAR)),
          |        1, 12))::BIGINT % 256,
          |      node) AS rank
          |  FROM vocab),
          |nv AS (SELECT count(*) AS n FROM vocab),
          |draws AS (
          |  SELECT p.start, p.center_step, p.context_step, p.center,
          |    j AS neg_index,
          |    1 + (('0x' || substring(md5(
          |      CAST(p.start AS VARCHAR) || '|' ||
          |      CAST(p.center_step AS VARCHAR) || '|' ||
          |      CAST(p.context_step AS VARCHAR) || '|' ||
          |      CAST(j AS VARCHAR) || '|' || 'n7'),
          |      1, 12))::BIGINT % nv.n) AS rank
          |  FROM pairs p, nv, LATERAL unnest(range(0, 2)) AS t(j))
          |SELECT d.start, d.center_step, d.context_step, d.neg_index,
          |       d.center, r.node AS negative
          |FROM draws d JOIN ranked r USING (rank)""".stripMargin,

      // the same frontier expansion as a recursive CTE: walk holds
      // every (node, walk length ≤ 3) pair — bounded by 4 rows per
      // node — and min over walk lengths IS the BFS distance
      "q_graph_bfs" ->
        """WITH RECURSIVE
          |g AS MATERIALIZED (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
          |         CAST(l_partkey + 10000000 AS BIGINT) AS dst
          |  FROM lineitem),
          |sym AS MATERIALIZED (
          |  SELECT src, dst FROM g
          |  UNION
          |  SELECT dst AS src, src AS dst FROM g),
          |walk(node, dist) AS (
          |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS node,
          |         0 AS dist
          |  FROM lineitem WHERE l_suppkey % 17 = 0
          |  UNION
          |  SELECT e.dst AS node, w.dist + 1 AS dist
          |  FROM walk w JOIN sym e ON e.src = w.node
          |  WHERE w.dist < 3)
          |SELECT node, CAST(min(dist) AS INT) AS dist
          |FROM walk GROUP BY 1""".stripMargin,

      "q_graph_pagerank_hosts" ->
        weightedPageRankHostsOracleSql(3, 0.85),

      // the hostgraph chain + the q_url_canon domain grammar (same
      // suffix-list interpolant), re-grouped at eTLD+1
      "q_graph_domaingraph" -> {
        def dom(l: String, h: String): String =
          s"""CASE WHEN len($l) <= 2
             |       OR regexp_matches($l[-1], '^[0-9]+$$') THEN $h
             |     WHEN list_contains([$urlSuffixesSql],
             |         $l[-2] || '.' || $l[-1]) AND len($l) >= 3
             |       THEN $l[-3] || '.' || $l[-2] || '.' || $l[-1]
             |     ELSE $l[-2] || '.' || $l[-1] END""".stripMargin
        s"""WITH ${linksOracleCte(
          "'https://site' || CAST(doc_id % 7 AS VARCHAR) || " +
            "'.example.com/dir' || CAST(doc_id % 5 AS VARCHAR) || " +
            "'/page/index.html'")},
hp AS (
  SELECT doc_id, regexp_replace(trim(href_abs), '#.*$$', '') AS t
  FROM lk
), hg AS (
  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR)
      || '.example.com' AS src_host,
    lower(regexp_replace(regexp_replace(
      regexp_extract(t, '^(?i)https?://([^/?#]*)', 1),
      '^[^@]*@', ''), ':[0-9]*$$', '')) AS dst_host,
    doc_id
  FROM hp
  WHERE regexp_matches(t, '^(?i)https?://[^/?#]+')
), hv AS (
  SELECT src_host, dst_host, doc_id,
    string_split(src_host, '.') AS sl,
    string_split(dst_host, '.') AS dl
  FROM hg WHERE dst_host IS NOT NULL AND dst_host <> ''
), dm AS (
  SELECT ${dom("sl", "src_host")} AS src_host,
    ${dom("dl", "dst_host")} AS dst_host, doc_id
  FROM hv
)
SELECT src_host, dst_host, count(*) AS n_links,
       count(DISTINCT doc_id) AS n_pages
FROM dm GROUP BY 1, 2"""
      },

      // PSL-rule mirror over the hosts this fixture actually emits:
      // example.com is a listed (private-style) suffix so 3-label
      // publishers keep their label; every 3-label .example.org host
      // is registrable as itself (the wildcard makes it a public
      // suffix and the exception names other.example.org outright);
      // everything else falls to the implicit-* last-two default
      "q_graph_domaingraph_psl" -> {
        def dom(l: String, h: String): String =
          s"""CASE WHEN len($l) <= 1
             |       OR regexp_matches($l[-1], '^[0-9]+$$') THEN $h
             |     WHEN len($l) >= 3 AND $l[-2] || '.' || $l[-1]
             |         = 'example.com'
             |       THEN $l[-3] || '.' || $l[-2] || '.' || $l[-1]
             |     WHEN len($l) = 3 AND $l[-2] || '.' || $l[-1]
             |         = 'example.org' THEN $h
             |     ELSE $l[-2] || '.' || $l[-1] END""".stripMargin
        s"""WITH ${linksOracleCte(
          "'https://site' || CAST(doc_id % 7 AS VARCHAR) || " +
            "'.example.com/dir' || CAST(doc_id % 5 AS VARCHAR) || " +
            "'/page/index.html'")},
hp AS (
  SELECT doc_id, regexp_replace(trim(href_abs), '#.*$$', '') AS t
  FROM lk
), hg AS (
  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR)
      || '.example.com' AS src_host,
    lower(regexp_replace(regexp_replace(
      regexp_extract(t, '^(?i)https?://([^/?#]*)', 1),
      '^[^@]*@', ''), ':[0-9]*$$', '')) AS dst_host,
    doc_id
  FROM hp
  WHERE regexp_matches(t, '^(?i)https?://[^/?#]+')
), hv AS (
  SELECT src_host, dst_host, doc_id,
    string_split(src_host, '.') AS sl,
    string_split(dst_host, '.') AS dl
  FROM hg WHERE dst_host IS NOT NULL AND dst_host <> ''
), dm AS (
  SELECT ${dom("sl", "src_host")} AS src_host,
    ${dom("dl", "dst_host")} AS dst_host, doc_id
  FROM hv
)
SELECT src_host, dst_host, count(*) AS n_links,
       count(DISTINCT doc_id) AS n_pages
FROM dm GROUP BY 1, 2"""
      },

      "q_graph_ppr" -> pprOracleSql(3, 0.85),

      // same folded neighbor set, degree band, wedge self-join with
      // the n<n orientation, decimal 1/ln(deg) sums, and top-20 cut
      "q_graph_adamic" ->
        """WITH e AS (
          |  SELECT l_suppkey AS x, l_partkey + 10000000 AS y
          |  FROM lineitem
          |), nbr AS MATERIALIZED (
          |  SELECT DISTINCT v, n FROM (
          |    SELECT x AS v, y AS n FROM e
          |    UNION ALL SELECT y AS v, x AS n FROM e)
          |), deg AS (
          |  SELECT v, CAST(count(*) AS BIGINT) AS deg FROM nbr
          |  GROUP BY 1
          |), cent AS MATERIALIZED (
          |  SELECT nbr.v, nbr.n, deg.deg
          |  FROM nbr JOIN deg USING (v)
          |  WHERE deg.deg BETWEEN 2 AND 64
          |), w AS (
          |  SELECT l.n AS a, r.n AS b,
          |    round(1.0::DOUBLE / ln(CAST(l.deg AS DOUBLE)), 9)
          |      ::DECIMAL(38,9) AS term
          |  FROM cent l JOIN cent r ON l.v = r.v AND l.n < r.n
          |), sc AS (
          |  SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
          |    sum(term) AS s
          |  FROM w GROUP BY 1, 2
          |), ex AS (SELECT v AS a, n AS b FROM nbr WHERE v < n),
          |fin AS (
          |  SELECT sc.a, sc.b, sc.n_common, round(s, 6)::DOUBLE AS score
          |  FROM sc LEFT JOIN ex ON sc.a = ex.a AND sc.b = ex.b
          |  WHERE ex.a IS NULL
          |)
          |SELECT a, b, n_common, score,
          |  CAST(row_number() OVER (ORDER BY score DESC, a, b) AS INT)
          |    AS rank
          |FROM fin ORDER BY score DESC, a, b LIMIT 20""".stripMargin,

      // both HITS half-steps per round unrolled with the same lattice
      // and normalization shape — see hitsOracleSql
      "q_graph_hits" -> hitsOracleSql(2),

      // components of the 30-min co-presence chains = gap-delimited
      // runs per event_type; component id = min event_id of the run;
      // single-event runs have no edge and so no component row
      "q_graph_components" ->
        """WITH g AS (
          |  SELECT event_type, event_id, ts,
          |    epoch(ts - lag(ts) OVER (PARTITION BY event_type
          |      ORDER BY ts, event_id)) AS gap
          |  FROM events
          |), runs AS (
          |  SELECT event_type, event_id,
          |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY event_type ORDER BY ts, event_id
          |            ROWS UNBOUNDED PRECEDING) AS run_id
          |  FROM g
          |)
          |SELECT event_id AS node,
          |       min(event_id) OVER (PARTITION BY event_type, run_id)
          |         AS component
          |FROM runs
          |QUALIFY count(*) OVER (PARTITION BY event_type, run_id) >= 2"""
          .stripMargin,

      // same equal-width binning over the observed range, same bounded
      // self-join cumsum, same guarded double ratio shapes
      "q_stats_prcurve" ->
        """WITH base AS (
          |  SELECT n_chars::DOUBLE AS s,
          |         len(string_split(text, ' ')) >= 60 AS y
          |  FROM documents
          |), mm AS (
          |  SELECT min(s) AS lo, max(s) - min(s) AS rng,
          |         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS pt
          |  FROM base
          |), per AS (
          |  SELECT least(floor((s - mm.lo) / mm.rng * 20)::INT, 19) AS b,
          |         count(*)::BIGINT AS n,
          |         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS np
          |  FROM base, mm GROUP BY 1
          |), cum AS (
          |  SELECT l.b, sum(h.n)::BIGINT AS n_pred, sum(h.np)::BIGINT AS tp
          |  FROM per l JOIN per h ON h.b >= l.b
          |  GROUP BY 1
          |)
          |SELECT mm.lo + mm.rng * cum.b::DOUBLE / 20 AS threshold,
          |  n_pred, tp, (n_pred - tp) AS fp,
          |  round(tp::DOUBLE / n_pred::DOUBLE, 6) AS precision,
          |  CASE WHEN mm.pt > 0
          |    THEN round(tp::DOUBLE / mm.pt::DOUBLE, 6) END AS recall,
          |  CASE WHEN tp > 0 AND mm.pt > 0 THEN
          |    round(2.0 * (tp::DOUBLE / n_pred::DOUBLE)
          |          * (tp::DOUBLE / mm.pt::DOUBLE)
          |          / ((tp::DOUBLE / n_pred::DOUBLE)
          |             + (tp::DOUBLE / mm.pt::DOUBLE)), 6)
          |  END AS f1
          |FROM cum, mm""".stripMargin,

      // same binning, same strictly-above self-join, same doubled
      // integer U statistic and final halved division
      "q_stats_auc" ->
        """WITH base AS (
          |  SELECT n_chars::DOUBLE AS s,
          |         len(string_split(text, ' ')) >= 60 AS y
          |  FROM documents
          |), mm AS (
          |  SELECT min(s) AS lo, max(s) - min(s) AS rng FROM base
          |), per AS (
          |  SELECT least(floor((s - mm.lo) / mm.rng * 20)::INT, 19) AS b,
          |         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS np,
          |         sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS nn
          |  FROM base, mm GROUP BY 1
          |), above AS (
          |  SELECT cur.b, cur.np, cur.nn,
          |         coalesce(sum(high.np), 0)::BIGINT AS pos_above
          |  FROM per cur LEFT JOIN per high ON high.b > cur.b
          |  GROUP BY 1, 2, 3
          |)
          |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
          |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
          |    round(sum(nn * (2 * pos_above + np))::DOUBLE
          |          / (2.0 * sum(np)::DOUBLE * sum(nn)::DOUBLE), 6)
          |  END AS auc
          |FROM above""".stripMargin,

      // same per-bin counts, same bounded self-join cumulation, same
      // exact-integer |cum_a*n_b - cum_b*n_a| compare; one double
      // division on the winner
      // same interpolated quantiles (round-6 thresholds) and gate shape
      "q_stats_mad" ->
        """WITH med AS (
          |  SELECT round(quantile_cont(value, 0.5), 6) AS m FROM events
          |), mad AS (
          |  SELECT round(quantile_cont(abs(value - med.m), 0.5), 6) AS d
          |  FROM events, med
          |), sc AS (SELECT round(1.4826 * mad.d, 6) AS s FROM mad)
          |SELECT event_id, value,
          |  round(abs(value - med.m), 6) AS abs_dev,
          |  CASE WHEN sc.s = 0 THEN abs(value - med.m) = 0
          |       ELSE abs(value - med.m) <= 3.5 * sc.s END AS keep
          |FROM events, med, sc""".stripMargin,

      // same union-of-categories smoothing and decimal-summed terms
      "q_stats_kl" ->
        """WITH ca AS (
          |  SELECT lang AS c, count(*) AS na FROM documents
          |  WHERE doc_id % 2 = 0 GROUP BY 1
          |), cb AS (
          |  SELECT lang AS c, count(*) AS nb FROM documents
          |  WHERE doc_id % 2 = 1 GROUP BY 1
          |), cats AS (
          |  SELECT coalesce(ca.c, cb.c) AS c,
          |    coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
          |  FROM ca FULL OUTER JOIN cb ON ca.c = cb.c
          |), t AS (
          |  SELECT sum(na) AS ta, sum(nb) AS tb, count(*) AS nc
          |  FROM cats
          |), terms AS (
          |  SELECT CAST(round(((na + 0.5) / (t.ta + 0.5 * t.nc)) *
          |    ln(((na + 0.5) / (t.ta + 0.5 * t.nc)) /
          |       ((nb + 0.5) / (t.tb + 0.5 * t.nc))), 9)
          |    AS DECIMAL(28,9)) AS trm
          |  FROM cats, t
          |)
          |SELECT t.ta::BIGINT AS n_a, t.tb::BIGINT AS n_b,
          |  t.nc::BIGINT AS n_categories,
          |  round(CAST((SELECT CAST(sum(trm) AS DECIMAL(28,9))
          |    FROM terms) AS DOUBLE), 6) AS kl_div
          |FROM t""".stripMargin,

      "q_stats_corr" -> corrOracleSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2),

      // same contingency counts, marginal-product join and
      // integer-exact kappa form (n_agree·n − e_mass)/(n² − e_mass)
      "q_stats_kappa" ->
        """WITH p AS (
          |  SELECT event_type AS a,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS b
          |  FROM events
          |), cont AS (
          |  SELECT a, b, count(*) AS c FROM p
          |  WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY a, b
          |), ma AS (SELECT a, sum(c) AS ca FROM cont GROUP BY a),
          |mb AS (SELECT b, sum(c) AS cb FROM cont GROUP BY b),
          |ag AS (
          |  SELECT sum(c) AS n,
          |    sum(CASE WHEN a = b THEN c ELSE 0 END) AS n_agree
          |  FROM cont
          |), ex AS (
          |  SELECT coalesce(sum(ca * cb), 0) AS e_mass
          |  FROM ma JOIN mb ON ma.a = mb.b
          |)
          |SELECT n::BIGINT AS n,
          |  round(n_agree::DOUBLE / n::DOUBLE, 6) AS observed_agreement,
          |  round(e_mass::DOUBLE / (n::DOUBLE * n::DOUBLE), 6)
          |    AS expected_agreement,
          |  CASE WHEN e_mass <> n * n THEN
          |    round((n_agree::DOUBLE * n::DOUBLE - e_mass::DOUBLE) /
          |      (n::DOUBLE * n::DOUBLE - e_mass::DOUBLE), 6)
          |  END AS kappa
          |FROM ag, ex""".stripMargin,

      // same dictionary-side anti-joins (LEFT JOIN ... IS NULL), same
      // separate null accounting per relationship
      // same string-form first digit, ln-shape expectations, identical
      // left-associated chi2 term shape, decimal-summed statistic
      "q_stats_benford" ->
        """WITH d AS (
          |  SELECT CAST(regexp_extract(
          |      CAST(l_extendedprice AS VARCHAR), '[1-9]', 0) AS INT)
          |    AS digit
          |  FROM lineitem
          |  WHERE regexp_extract(CAST(l_extendedprice AS VARCHAR),
          |    '[1-9]', 0) <> ''
          |), c AS (
          |  SELECT digit, CAST(count(*) AS BIGINT) AS cnt
          |  FROM d GROUP BY 1
          |), g AS (
          |  SELECT CAST(i AS INT) AS digit
          |  FROM unnest(range(1, 10)) t(i)
          |), j AS (
          |  SELECT g.digit, coalesce(c.cnt, 0) AS cnt
          |  FROM g LEFT JOIN c ON c.digit = g.digit
          |), tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS nd FROM j),
          |e AS (
          |  SELECT digit, cnt, nd,
          |    ln(1.0::DOUBLE + 1.0::DOUBLE / CAST(digit AS DOUBLE))
          |      / ln(10.0::DOUBLE) AS ef
          |  FROM j CROSS JOIN tot
          |), t AS (
          |  SELECT digit, cnt, nd, ef,
          |    round((CAST(cnt AS DOUBLE) - nd * ef) *
          |          (CAST(cnt AS DOUBLE) - nd * ef) / (nd * ef), 9)
          |      ::DECIMAL(38,9) AS t9
          |  FROM e
          |)
          |SELECT digit, cnt,
          |  round((CAST(cnt AS DOUBLE) / nd) * CAST(1e6 AS DOUBLE))
          |    ::DOUBLE / CAST(1e6 AS DOUBLE) AS obs_frac,
          |  round(ef * CAST(1e6 AS DOUBLE))::DOUBLE
          |    / CAST(1e6 AS DOUBLE) AS exp_frac,
          |  round(sum(t9) OVER (), 6)::DOUBLE AS chi2
          |FROM t""".stripMargin,

      // same fences: quantile_cont == Spark's exact percentile, round-6
      // thresholds, same clip expression and flag
      "q_stats_winsorize" ->
        """WITH t AS (SELECT event_id, value FROM events),
          |q AS (
          |  SELECT round(quantile_cont(value, 0.05), 6) AS tlo,
          |         round(quantile_cont(value, 0.95), 6) AS thi
          |  FROM t
          |)
          |SELECT event_id, value,
          |  CASE WHEN value IS NOT NULL
          |    THEN least(greatest(value, tlo), thi) END AS clipped,
          |  CASE WHEN value IS NOT NULL
          |    THEN (value < tlo OR value > thi) END AS was_clipped
          |FROM t CROSS JOIN q""".stripMargin,

      // same integer cells and margins, same fixed e/term shapes,
      // same round-9 DECIMAL term sums + closed-form zero-cell mass
      "q_stats_chi2" ->
        """WITH cells AS (
          |  SELECT event_type AS a, (value > 50.0) AS b,
          |         count(*) AS o
          |  FROM events
          |  WHERE event_type IS NOT NULL
          |    AND (value > 50.0) IS NOT NULL
          |  GROUP BY 1, 2
          |), dims AS (
          |  SELECT count(DISTINCT a) AS r, count(DISTINCT b) AS c,
          |         count(*) AS n_cells, sum(o)::BIGINT AS n
          |  FROM cells
          |), m AS (
          |  SELECT o,
          |    sum(o) OVER (PARTITION BY a) AS ra,
          |    sum(o) OVER (PARTITION BY b) AS cb
          |  FROM cells
          |), t AS (
          |  SELECT
          |    CAST(round((od - e) * (od - e) / e, 9)
          |      AS DECIMAL(38,9)) AS t9,
          |    CAST(round(e, 9) AS DECIMAL(38,9)) AS e9
          |  FROM (
          |    SELECT CAST(o AS DOUBLE) AS od,
          |      CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
          |        / CAST(n AS DOUBLE) AS e
          |    FROM m CROSS JOIN dims) x
          |), s AS (
          |  SELECT sum(t9) AS tsum, sum(e9) AS esum FROM t
          |)
          |SELECT n, n_cells, (r - 1) * (c - 1) AS df_degrees,
          |  round(CAST(tsum + (CAST(n AS DECIMAL(38,9)) - esum)
          |      AS DOUBLE) * 1e6)::DOUBLE / 1e6 AS chi2,
          |  round(sqrt(CAST(tsum + (CAST(n AS DECIMAL(38,9)) - esum)
          |      AS DOUBLE) /
          |    (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)))
          |    * 1e6)::DOUBLE / 1e6 AS cramers_v
          |FROM s CROSS JOIN dims""".stripMargin,

      // exact integer counts, same pooled-z double shape, same 1e6
      // display rounding; null successes drop on both sides
      "q_stats_ztest" ->
        """WITH q AS (
          |  SELECT event_type AS g, (value > 50.0) AS hit
          |  FROM events
          |  WHERE event_type IN ('click', 'purchase')
          |    AND (value > 50.0) IS NOT NULL
          |), w0 AS (
          |  SELECT g, count(*) AS n,
          |    sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS k
          |  FROM q GROUP BY 1
          |), w AS (
          |  SELECT
          |    max(CASE WHEN g = 'click' THEN n END) AS n_a,
          |    max(CASE WHEN g = 'click' THEN k END) AS k_a,
          |    max(CASE WHEN g = 'purchase' THEN n END) AS n_b,
          |    max(CASE WHEN g = 'purchase' THEN k END) AS k_b
          |  FROM w0
          |), e AS (
          |  SELECT n_a, k_a, n_b, k_b,
          |    CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
          |    CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
          |    CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
          |      AS p
          |  FROM w
          |)
          |SELECT 'click' AS group_a, 'purchase' AS group_b,
          |  n_a, k_a, n_b, k_b,
          |  round(ra * 1e6)::DOUBLE / 1e6 AS rate_a,
          |  round(rb * 1e6)::DOUBLE / 1e6 AS rate_b,
          |  round((ra - rb) / sqrt(p * (1.0 - p) *
          |    (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
          |    * 1e6)::DOUBLE / 1e6 AS z_stat
          |FROM e""".stripMargin,

      // same 1e4 lattice, same hi/lo exact moments (v*v >= 0 so
      // DuckDB's flooring // == Spark's truncating DIV), same fixed
      // double shapes for mean/var/t/df, same 1e6 display rounding
      "q_stats_ttest" ->
        """WITH q AS (
          |  SELECT event_type AS g,
          |    CAST(round(value * 10000.0) AS BIGINT) AS v
          |  FROM events
          |  WHERE event_type IN ('click', 'view')
          |    AND value IS NOT NULL AND NOT isnan(value)
          |), m AS (
          |  SELECT g, count(*) AS n, sum(v) AS s,
          |    sum((v * v) // 1000000000) AS ph,
          |    sum((v * v) % 1000000000) AS pl
          |  FROM q GROUP BY 1
          |), w AS (
          |  SELECT
          |    max(CASE WHEN g = 'click' THEN n END) AS n_a,
          |    max(CASE WHEN g = 'click' THEN s END) AS s_a,
          |    max(CASE WHEN g = 'click' THEN ph END) AS ph_a,
          |    max(CASE WHEN g = 'click' THEN pl END) AS pl_a,
          |    max(CASE WHEN g = 'view' THEN n END) AS n_b,
          |    max(CASE WHEN g = 'view' THEN s END) AS s_b,
          |    max(CASE WHEN g = 'view' THEN ph END) AS ph_b,
          |    max(CASE WHEN g = 'view' THEN pl END) AS pl_b
          |  FROM m
          |), e AS (
          |  SELECT n_a, n_b,
          |    CAST(s_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 10000.0)
          |      AS mean_a,
          |    CAST(s_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 10000.0)
          |      AS mean_b,
          |    CAST(CAST(n_a AS HUGEINT) *
          |        (1000000000::HUGEINT * ph_a + pl_a) -
          |        CAST(s_a AS HUGEINT) * CAST(s_a AS HUGEINT)
          |      AS DOUBLE) /
          |      (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)) /
          |      (10000.0 * 10000.0) AS var_a,
          |    CAST(CAST(n_b AS HUGEINT) *
          |        (1000000000::HUGEINT * ph_b + pl_b) -
          |        CAST(s_b AS HUGEINT) * CAST(s_b AS HUGEINT)
          |      AS DOUBLE) /
          |      (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)) /
          |      (10000.0 * 10000.0) AS var_b
          |  FROM w
          |), f AS (
          |  SELECT n_a, n_b, mean_a AS ma, mean_b AS mb,
          |    var_a / CAST(n_a AS DOUBLE) AS sa,
          |    var_b / CAST(n_b AS DOUBLE) AS sb
          |  FROM e
          |)
          |SELECT 'click' AS group_a, 'view' AS group_b, n_a, n_b,
          |  round(ma * 1e6)::DOUBLE / 1e6 AS mean_a,
          |  round(mb * 1e6)::DOUBLE / 1e6 AS mean_b,
          |  round((ma - mb) / sqrt(sa + sb) * 1e6)::DOUBLE
          |    / 1e6 AS t_stat,
          |  round(((sa + sb) * (sa + sb)) /
          |      (sa * sa / (CAST(n_a AS DOUBLE) - 1.0) +
          |       sb * sb / (CAST(n_b AS DOUBLE) - 1.0)) * 1e6)::DOUBLE
          |    / 1e6 AS df_welch
          |FROM f""".stripMargin,

      // same banding (floor of an IEEE double division — identical
      // in both engines), same group-count-below-k filter
      "q_stats_kanon" ->
        """SELECT c_nationkey, c_mktsegment,
          |  CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_band,
          |  count(*) AS group_size
          |FROM customer
          |GROUP BY 1, 2, 3
          |HAVING count(*) < 5""".stripMargin,

      // keep rows whose combination reaches k: same aggregate,
      // IS NOT DISTINCT FROM join (the engine's <=> semi join)
      "q_stats_kanon_suppress" ->
        """WITH b AS (
          |  SELECT c_custkey, c_nationkey, c_mktsegment,
          |    CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_band
          |  FROM customer
          |), g AS (
          |  SELECT c_nationkey, c_mktsegment, bal_band
          |  FROM b GROUP BY 1, 2, 3 HAVING count(*) >= 5
          |)
          |SELECT b.c_custkey, b.c_nationkey, b.c_mktsegment,
          |       b.bal_band
          |FROM b JOIN g
          |  ON b.c_nationkey IS NOT DISTINCT FROM g.c_nationkey
          | AND b.c_mktsegment IS NOT DISTINCT FROM g.c_mktsegment
          | AND b.bal_band IS NOT DISTINCT FROM g.bal_band""".stripMargin,

      // same key-dictionary windows: asc/desc row_number with the key
      // tie-break, exact integer rank-sum, identical Gini and
      // top-share shapes, integer-scale display
      "q_stats_concentration" ->
        """WITH c AS (
          |  SELECT CAST(o_custkey AS VARCHAR) AS k,
          |    CAST(count(*) AS BIGINT) AS cnt
          |  FROM orders GROUP BY 1
          |), r AS (
          |  SELECT k, cnt,
          |    CAST(row_number() OVER (ORDER BY cnt ASC,
          |      k ASC NULLS FIRST) AS BIGINT) AS ra,
          |    CAST(row_number() OVER (ORDER BY cnt DESC,
          |      k ASC NULLS FIRST) AS BIGINT) AS rd,
          |    CAST(count(*) OVER () AS BIGINT) AS nk
          |  FROM c
          |), a AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
          |    CAST(sum(cnt) AS BIGINT) AS n_rows,
          |    CAST(sum(ra * cnt) AS BIGINT) AS s,
          |    CAST(sum(CASE WHEN rd <=
          |        CAST(ceil(0.01::DOUBLE * nk) AS BIGINT)
          |      THEN cnt END) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
          |      AS t1,
          |    CAST(sum(CASE WHEN rd <=
          |        CAST(ceil(0.1::DOUBLE * nk) AS BIGINT)
          |      THEN cnt END) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
          |      AS t10
          |  FROM r
          |)
          |SELECT n_keys, n_rows,
          |  round((2.0::DOUBLE * CAST(s AS DOUBLE) /
          |    (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)) -
          |    CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE))
          |    * CAST(1e6 AS DOUBLE))::DOUBLE / CAST(1e6 AS DOUBLE)
          |    AS gini,
          |  round(t1 * CAST(1e6 AS DOUBLE))::DOUBLE
          |    / CAST(1e6 AS DOUBLE) AS share_top_1pct,
          |  round(t10 * CAST(1e6 AS DOUBLE))::DOUBLE
          |    / CAST(1e6 AS DOUBLE) AS share_top_10pct
          |FROM a""".stripMargin,

      "q_stats_integrity" ->
        """WITH
          |li_o AS (
          |  SELECT l_orderkey AS k, count(*)::BIGINT AS n
          |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
          |o_c AS (
          |  SELECT o_custkey AS k, count(*)::BIGINT AS n
          |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
          |li_p AS (
          |  SELECT l_partkey AS k, count(*)::BIGINT AS n
          |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
          |e_c AS (
          |  SELECT user_id AS k, count(*)::BIGINT AS n
          |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
          |SELECT 'lineitem.l_orderkey->orders.o_orderkey'
          |    AS relationship,
          |  count(*)::BIGINT AS n_orphan_keys,
          |  coalesce(sum(n), 0)::BIGINT AS n_orphan_rows,
          |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
          |    ::BIGINT AS n_null_rows
          |FROM li_o LEFT JOIN (SELECT DISTINCT o_orderkey AS pk
          |  FROM orders) p ON li_o.k = p.pk WHERE p.pk IS NULL
          |UNION ALL
          |SELECT 'orders.o_custkey->customer.c_custkey',
          |  count(*)::BIGINT, coalesce(sum(n), 0)::BIGINT,
          |  (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
          |    ::BIGINT
          |FROM o_c LEFT JOIN (SELECT DISTINCT c_custkey AS pk
          |  FROM customer) p ON o_c.k = p.pk WHERE p.pk IS NULL
          |UNION ALL
          |SELECT 'lineitem.l_partkey->part.p_partkey',
          |  count(*)::BIGINT, coalesce(sum(n), 0)::BIGINT,
          |  (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL)
          |    ::BIGINT
          |FROM li_p LEFT JOIN (SELECT DISTINCT p_partkey AS pk
          |  FROM part) p ON li_p.k = p.pk WHERE p.pk IS NULL
          |UNION ALL
          |SELECT 'events.user_id->customer.c_custkey',
          |  count(*)::BIGINT, coalesce(sum(n), 0)::BIGINT,
          |  (SELECT count(*) FROM events WHERE user_id IS NULL)
          |    ::BIGINT
          |FROM e_c LEFT JOIN (SELECT DISTINCT c_custkey AS pk
          |  FROM customer) p ON e_c.k = p.pk WHERE p.pk IS NULL
          |""".stripMargin,

      // same one-pass constraint metrics, reshaped to one row per
      // column; decimal-summed means, round-6 ratios
      "q_stats_profile" ->
        """WITH m AS (
          |  SELECT count(*) AS n,
          |    count(c_custkey) AS nn1, count(DISTINCT c_custkey) AS nd1,
          |    min(c_custkey::DOUBLE) AS mn1, max(c_custkey::DOUBLE) AS mx1,
          |    CAST(sum(CAST(round(c_custkey::DOUBLE, 9) AS DECIMAL(38,9)))
          |      AS DECIMAL(38,9)) AS sm1,
          |    count(c_acctbal) AS nn2, count(DISTINCT c_acctbal) AS nd2,
          |    min(c_acctbal::DOUBLE) AS mn2, max(c_acctbal::DOUBLE) AS mx2,
          |    CAST(sum(CAST(round(c_acctbal::DOUBLE, 9) AS DECIMAL(38,9)))
          |      AS DECIMAL(38,9)) AS sm2,
          |    count(c_mktsegment) AS nn3,
          |    count(DISTINCT c_mktsegment) AS nd3
          |  FROM customer)
          |SELECT 'c_custkey' AS "column", n::BIGINT AS n_rows,
          |  (n - nn1)::BIGINT AS n_null,
          |  round(nn1::DOUBLE / n::DOUBLE, 6) AS completeness,
          |  nd1::BIGINT AS n_distinct, mn1 AS min_value, mx1 AS max_value,
          |  CASE WHEN nn1 > 0 THEN round(sm1::DOUBLE / nn1::DOUBLE, 6)
          |  END AS mean_value
          |FROM m
          |UNION ALL
          |SELECT 'c_acctbal', n::BIGINT, (n - nn2)::BIGINT,
          |  round(nn2::DOUBLE / n::DOUBLE, 6), nd2::BIGINT, mn2, mx2,
          |  CASE WHEN nn2 > 0 THEN round(sm2::DOUBLE / nn2::DOUBLE, 6) END
          |FROM m
          |UNION ALL
          |SELECT 'c_mktsegment', n::BIGINT, (n - nn3)::BIGINT,
          |  round(nn3::DOUBLE / n::DOUBLE, 6), nd3::BIGINT,
          |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
          |  CAST(NULL AS DOUBLE)
          |FROM m""".stripMargin,

      // the merge is exact (sums/mins/decimal sums), so the oracle is
      // simply the DIRECT profile over orders — no shard replay needed
      "q_stats_profile_shards" ->
        """WITH m AS (
          |  SELECT count(*) AS n,
          |    count(o_totalprice) AS nn1,
          |    min(o_totalprice::DOUBLE) AS mn1,
          |    max(o_totalprice::DOUBLE) AS mx1,
          |    CAST(sum(CAST(round(o_totalprice::DOUBLE, 9)
          |      AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sm1,
          |    count(o_custkey) AS nn2,
          |    min(o_custkey::DOUBLE) AS mn2,
          |    max(o_custkey::DOUBLE) AS mx2,
          |    CAST(sum(CAST(round(o_custkey::DOUBLE, 9)
          |      AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sm2
          |  FROM orders)
          |SELECT 'o_totalprice' AS "column", n::BIGINT AS n_rows,
          |  (n - nn1)::BIGINT AS n_null,
          |  round(nn1::DOUBLE / n::DOUBLE, 6) AS completeness,
          |  mn1 AS min_value, mx1 AS max_value,
          |  CASE WHEN nn1 > 0 THEN round(sm1::DOUBLE / nn1::DOUBLE, 6)
          |  END AS mean_value
          |FROM m
          |UNION ALL
          |SELECT 'o_custkey', n::BIGINT, (n - nn2)::BIGINT,
          |  round(nn2::DOUBLE / n::DOUBLE, 6), mn2, mx2,
          |  CASE WHEN nn2 > 0 THEN round(sm2::DOUBLE / nn2::DOUBLE, 6) END
          |FROM m""".stripMargin,

      // HLL registers replicated from the same md5 hash: bucket =
      // first 3 hex chars, rho = 49 - bit-length of the next 48 bits
      // (exact integer string-length logic), Σ 2^(49-r) as an exact
      // BIGINT, then the fixed-shape alpha·m²/S estimate with the
      // linear-counting small-range branch
      "q_stats_distinct" ->
        """WITH vals AS (
          |  SELECT 'lang' AS c, CAST(lang AS VARCHAR) AS v
          |  FROM documents WHERE lang IS NOT NULL
          |  UNION ALL
          |  SELECT 'source', CAST(source AS VARCHAR)
          |  FROM documents WHERE source IS NOT NULL
          |  UNION ALL
          |  SELECT 'doc_id', CAST(doc_id AS VARCHAR)
          |  FROM documents WHERE doc_id IS NOT NULL
          |), r AS (
          |  SELECT c,
          |    ('0x' || substr(md5(v), 1, 3))::INT AS bucket,
          |    ('0x' || substr(md5(v), 4, 12))::BIGINT AS w
          |  FROM vals
          |), reg AS (
          |  SELECT c, bucket,
          |    max(CASE WHEN w = 0 THEN 49
          |        ELSE 49 - length(bin(w)) END) AS r
          |  FROM r GROUP BY 1, 2
          |), agg AS (
          |  SELECT c, count(*) AS n_reg,
          |    sum((1::BIGINT << (49 - r)))::BIGINT AS s_present
          |  FROM reg GROUP BY 1
          |), e AS (
          |  SELECT c, n_reg,
          |    (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 *
          |      562949953421312.0 /
          |      CAST(s_present + (4096 - n_reg) *
          |        (1::BIGINT << 49) AS DOUBLE) AS e_raw,
          |    CAST(4096 - n_reg AS DOUBLE) AS v_zero
          |  FROM agg
          |)
          |SELECT c AS "column", n_reg::BIGINT AS n_registers,
          |  round(CASE WHEN e_raw <= 2.5 * 4096.0 AND v_zero > 0
          |        THEN 4096.0 * ln(4096.0 / v_zero)
          |        ELSE e_raw END * 1e6)::DOUBLE / 1e6 AS estimate
          |FROM e""".stripMargin,

      // same floor-division binning; only observed bins appear
      "q_stats_histogram" ->
        """WITH b AS (
          |  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin
          |  FROM lineitem)
          |SELECT bin, bin::DOUBLE * 5000.0 AS lo,
          |  (bin + 1)::DOUBLE * 5000.0 AS hi, count(*)::BIGINT AS n
          |FROM b GROUP BY 1""".stripMargin,

      // same observed-range binning, bounded-join cumulation, and
      // broadcast pct lookup
      "q_stats_ecdf" ->
        """WITH src AS (
          |  SELECT event_id, value,
          |    CASE WHEN isnan(value) THEN NULL ELSE value END AS v
          |  FROM events
          |), mm AS (
          |  SELECT min(v) AS lo, max(v) AS hi, count(v) AS n FROM src
          |), b AS (
          |  SELECT event_id, value,
          |    CASE WHEN v IS NULL THEN NULL
          |         WHEN mm.hi = mm.lo THEN 0
          |         ELSE least(CAST(floor((v - mm.lo) /
          |           (mm.hi - mm.lo) * 100) AS INT), 99) END AS bin
          |  FROM src, mm
          |), per AS MATERIALIZED (
          |  SELECT bin, count(*) AS n FROM b WHERE bin IS NOT NULL
          |  GROUP BY 1
          |), cum AS (
          |  SELECT p.bin, sum(h.n) AS cum
          |  FROM per p JOIN per h ON h.bin <= p.bin GROUP BY 1
          |)
          |SELECT b.event_id, b.value,
          |  round(cum.cum::DOUBLE / mm.n::DOUBLE, 6) AS pct
          |FROM b LEFT JOIN cum ON b.bin = cum.bin, mm""".stripMargin,

      // same fixed [0,1] bins, decimal prediction mass, round-6 rates
      "q_stats_calibration" ->
        """WITH base AS (
          |  SELECT l_discount * 10 AS p, l_quantity > 25 AS y
          |  FROM lineitem
          |), g AS (
          |  SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
          |    count(*) AS n,
          |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
          |    CAST(sum(CAST(round(p, 9) AS DECIMAL(28,9)))
          |      AS DECIMAL(38,9)) AS pm
          |  FROM base GROUP BY 1
          |)
          |SELECT bin, bin::DOUBLE / 10 AS p_lo,
          |  (bin + 1)::DOUBLE / 10 AS p_hi, n::BIGINT AS n,
          |  round(pm::DOUBLE / n::DOUBLE, 6) AS mean_predicted,
          |  round(np::DOUBLE / n::DOUBLE, 6) AS positive_rate
          |FROM g""".stripMargin,

      // same interpolated octiles (round-6 thresholds), same
      // count-of-thresholds-below binning with ties upward
      "q_stats_histogram_eq" ->
        """WITH cl AS (
          |  SELECT value AS v FROM events WHERE value IS NOT NULL
          |), th AS (
          |  SELECT list_transform(
          |    quantile_cont(v, [0.125, 0.25, 0.375, 0.5,
          |                      0.625, 0.75, 0.875]),
          |    t -> round(t, 6)) AS ts
          |  FROM cl
          |), bn AS (
          |  SELECT CAST(len(list_filter(th.ts, t -> cl.v >= t)) AS INT)
          |    AS bin
          |  FROM cl, th
          |)
          |SELECT bin,
          |  CASE WHEN bin > 0 THEN th.ts[bin] END AS lo,
          |  CASE WHEN bin < 7 THEN th.ts[bin + 1] END AS hi,
          |  count(*)::BIGINT AS n
          |FROM bn, th GROUP BY 1, 2, 3""".stripMargin,

      // same count agg, share/mean/ratio double shapes, desc-count +
      // key-asc tie-break at the top-N boundary
      "q_join_skewreport" ->
        """WITH c AS (
          |  SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS cnt
          |  FROM lineitem GROUP BY 1
          |), s AS (
          |  SELECT count(*) AS n_keys, sum(cnt) AS total,
          |         max(cnt) AS max_cnt FROM c
          |), top AS (
          |  SELECT key, cnt,
          |    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT)
          |      AS rank
          |  FROM c ORDER BY cnt DESC, key LIMIT 10
          |)
          |SELECT rank, key, cnt::BIGINT AS cnt,
          |  round(cnt::DOUBLE / s.total::DOUBLE, 6) AS share,
          |  s.n_keys::BIGINT AS n_keys,
          |  round(s.total::DOUBLE / s.n_keys::DOUBLE, 6) AS mean_cnt,
          |  s.max_cnt::BIGINT AS max_cnt,
          |  round(s.max_cnt::DOUBLE * s.n_keys::DOUBLE / s.total::DOUBLE, 6)
          |    AS skew_ratio
          |FROM top, s""".stripMargin,

      // same per-bin counts as q_stats_ks, then the union-smoothed
      // (p-q)·ln(p/q) terms round to 9 and sum as DECIMAL
      "q_stats_psi" ->
        """WITH ba AS (
          |  SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
          |         count(*) AS na
          |  FROM events WHERE event_type = 'click' GROUP BY 1
          |), bb AS (
          |  SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
          |         count(*) AS nb
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1
          |), bins AS MATERIALIZED (
          |  SELECT coalesce(ba.bin, bb.bin) AS bin,
          |         coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
          |  FROM ba FULL OUTER JOIN bb ON ba.bin = bb.bin
          |), t AS (
          |  SELECT sum(na) AS ta, sum(nb) AS tb, count(*) AS nc
          |  FROM bins
          |), terms AS (
          |  SELECT CAST(round(
          |    (((na + 0.5) / (t.ta + 0.5 * t.nc)) -
          |     ((nb + 0.5) / (t.tb + 0.5 * t.nc))) *
          |    ln(((na + 0.5) / (t.ta + 0.5 * t.nc)) /
          |       ((nb + 0.5) / (t.tb + 0.5 * t.nc))), 9)
          |    AS DECIMAL(28,9)) AS trm
          |  FROM bins, t
          |)
          |SELECT t.ta::BIGINT AS n_a, t.tb::BIGINT AS n_b,
          |  t.nc::BIGINT AS n_bins,
          |  round(CAST((SELECT CAST(sum(trm) AS DECIMAL(28,9))
          |    FROM terms) AS DOUBLE), 6) AS psi
          |FROM t""".stripMargin,

      // same user-keyed pair join, half-open lookback, round-6 decimal
      // credits summed as DECIMAL
      "q_events_attribution" ->
        """WITH conv AS (
          |  SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS cts
          |  FROM events WHERE event_type = 'purchase'
          |), touch AS (
          |  SELECT user_id AS u, event_id AS tid,
          |    event_type AS touch_type, epoch_us(ts) AS tts
          |  FROM events WHERE event_type <> 'purchase'
          |), paired AS (
          |  SELECT cid, touch_type FROM conv JOIN touch USING (u)
          |  WHERE tts < cts AND tts >= cts - 21600000000
          |), credited AS (
          |  SELECT cid, touch_type,
          |    CAST(round(1.0 / (count(*) OVER (PARTITION BY cid)), 6)
          |      AS DECIMAL(16,6)) AS credit
          |  FROM paired
          |)
          |SELECT touch_type, count(DISTINCT cid)::BIGINT AS n_conversions,
          |  round(CAST(sum(credit) AS DOUBLE), 6) AS credit
          |FROM credited GROUP BY 1""".stripMargin,

      // same run-collapse (lag) then interval stitch (lead), both
      // windows keyed by user
      "q_events_scd2" ->
        """WITH runs AS (
          |  SELECT user_id AS key, event_type AS value, ts AS ts0,
          |    event_id AS tie,
          |    lag(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS prev,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS rn
          |  FROM events)
          |SELECT key, value, ts0 AS valid_from,
          |  lead(ts0) OVER (PARTITION BY key ORDER BY ts0, tie)
          |    AS valid_to,
          |  lead(ts0) OVER (PARTITION BY key ORDER BY ts0, tie) IS NULL
          |    AS is_current
          |FROM runs WHERE rn = 1 OR prev IS DISTINCT FROM value"""
          .stripMargin,

      // same (ts, event_id)-ordered lead per user, same count/window
      // normalization; n_from cast back to BIGINT (DuckDB window sums
      // to HUGEINT)
      "q_events_transitions" ->
        """WITH pairs AS (
          |  SELECT event_type AS src_type,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS dst_type
          |  FROM events
          |), c AS (
          |  SELECT src_type, dst_type, count(*)::BIGINT AS n_pairs
          |  FROM pairs WHERE dst_type IS NOT NULL GROUP BY 1, 2
          |)
          |SELECT src_type, dst_type, n_pairs,
          |  CAST(sum(n_pairs) OVER (PARTITION BY src_type) AS BIGINT)
          |    AS n_from,
          |  round(n_pairs::DOUBLE /
          |    CAST(sum(n_pairs) OVER (PARTITION BY src_type) AS BIGINT)
          |      ::DOUBLE, 6) AS prob
          |FROM c""".stripMargin,

      // same single window for both leads, same (count desc, path asc)
      // deterministic cut
      "q_events_paths" ->
        """WITH w AS (
          |  SELECT event_type AS s0,
          |    lead(event_type, 1) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS s1,
          |    lead(event_type, 2) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS s2
          |  FROM events
          |)
          |SELECT s0 || '>' || s1 || '>' || s2 AS path,
          |  count(*)::BIGINT AS n_paths
          |FROM w WHERE s0 IS NOT NULL AND s1 IS NOT NULL
          |  AND s2 IS NOT NULL
          |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20""".stripMargin,

      // same desc (ts, event_id) recency rank, same power-of-two
      // weights (pow(0.5,k) is exact), same round-9 decimal terms
      "q_events_decayed" ->
        """WITH ranked AS (
          |  SELECT user_id, value,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts DESC, event_id DESC) - 1 AS k
          |  FROM events
          |)
          |SELECT user_id, count(*)::BIGINT AS n_recent,
          |  CAST(sum(CAST(round(value * pow(0.5, k), 9)
          |    AS DECIMAL(38,9))) AS DOUBLE) AS decayed_value
          |FROM ranked WHERE k < 8 GROUP BY 1""".stripMargin,

      // same 48-bit md5 u, same ln(u)/w key rounded 9, desc + id ties
      "q_sample_weighted_k" ->
        """WITH u AS (
          |  SELECT doc_id, lang, source, n_chars,
          |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
          |      ::BIGINT::DOUBLE / 281474976710656.0 AS uu
          |  FROM documents WHERE n_chars > 0
          |)
          |SELECT doc_id, lang, source, n_chars FROM u
          |ORDER BY round(ln(uu) / n_chars::DOUBLE, 9) DESC, doc_id
          |LIMIT 100""".stripMargin,

      // same md5 pseudo-order and id tiebreak as the stratified-sample
      // oracle, capped at a constant instead of a fraction
      "q_sample_cap" ->
        """WITH ranked AS (
          |  SELECT doc_id, lang, source,
          |    row_number() OVER (PARTITION BY source
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
          |  FROM documents)
          |SELECT doc_id, lang, source FROM ranked
          |WHERE rnk <= 50""".stripMargin,

      // the q_text_vocab construction on the 90% split (same tf-desc /
      // token-asc tie-break at the LIMIT boundary), left-joined to the
      // held split's tokens
      "q_text_oov" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
          |  FROM documents WHERE doc_id % 10 <> 0),
          |per AS (
          |  SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
          |agg AS (
          |  SELECT token, CAST(sum(c) AS BIGINT) AS tf FROM per
          |  GROUP BY 1),
          |vocab AS (
          |  SELECT token FROM agg ORDER BY tf DESC, token LIMIT 500),
          |held AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          |  FROM documents WHERE doc_id % 10 = 0)
          |SELECT h.doc_id, count(h.tok)::BIGINT AS n_tokens,
          |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_oov,
          |  CASE WHEN count(h.tok) > 0 THEN
          |    round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
          |      ::DOUBLE / count(h.tok)::DOUBLE, 6)
          |  END AS oov_rate
          |FROM held h LEFT JOIN vocab v ON h.tok = v.token
          |GROUP BY h.doc_id""".stripMargin,

      "q_stats_ks" ->
        """WITH ba AS (
          |  SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
          |         count(*) AS ca
          |  FROM events WHERE event_type = 'click' GROUP BY 1
          |), bb AS (
          |  SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
          |         count(*) AS cb
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1
          |), per AS MATERIALIZED (
          |  SELECT coalesce(ba.bin, bb.bin) AS bin,
          |         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
          |  FROM ba FULL OUTER JOIN bb ON ba.bin = bb.bin
          |), cum AS (
          |  SELECT p.bin, sum(h.ca)::BIGINT AS cum_a,
          |         sum(h.cb)::BIGINT AS cum_b
          |  FROM per p JOIN per h ON h.bin <= p.bin GROUP BY 1
          |), tot AS (
          |  SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
          |         count(*)::BIGINT AS n_bins FROM per
          |), scaled AS MATERIALIZED (
          |  SELECT bin, abs(cum_a * n_b - cum_b * n_a) AS diff
          |  FROM cum, tot
          |), mx AS (SELECT max(diff) AS mx FROM scaled)
          |SELECT t.n_a, t.n_b, t.n_bins,
          |  round(mx.mx::DOUBLE / (t.n_a * t.n_b)::DOUBLE, 6) AS d_stat,
          |  (SELECT min(bin) FROM scaled, mx WHERE diff = mx.mx)
          |    AS at_bin
          |FROM tot t, mx""".stripMargin,

      // peeling unrolled to 16 rounds — far past the graph's
      // convergence depth, and no-ops once fixed
      "q_graph_kcore" -> kCoreOracleSql(15, 16),

      // synchronous LPA rounds unrolled; same votes/max/tie-break aggs
      "q_graph_lpa" -> lpaOracleSql(3),

      // same symmetric Pearson sums: integer aggregates, one double
      // division, round 6
      "q_graph_assortativity" ->
        s"""WITH $coOrderUndSql, deg AS (
           |  SELECT node, count(*) AS deg FROM (
           |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
           |  GROUP BY 1
           |), sym AS (
           |  SELECT a AS x, b AS y FROM und
           |  UNION ALL SELECT b AS x, a AS y FROM und
           |), j AS (
           |  SELECT dx.deg AS dx, dy.deg AS dy
           |  FROM sym JOIN deg dx ON dx.node = sym.x
           |           JOIN deg dy ON dy.node = sym.y
           |)
           |SELECT (count(*) / 2)::BIGINT AS n_edges,
           |  round((count(*) * sum(dx * dy) - sum(dx) * sum(dx))::DOUBLE
           |    / (count(*) * sum(dx * dx) - sum(dx) * sum(dx))::DOUBLE,
           |    6) AS assortativity
           |FROM j""".stripMargin,

      // exhaustive triangle enumeration over the same co-order graph:
      // canonical a<b edges, a<b<c closure join, membership unpivot
      "q_graph_triangles" ->
        s"""WITH $coOrderUndSql, deg AS (
          |  SELECT node, count(*) AS deg FROM (
          |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
          |  GROUP BY node
          |), tri AS (
          |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
          |  FROM und e1
          |  JOIN und e2 ON e2.a = e1.b
          |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
          |), memb AS (
          |  SELECT x AS node FROM tri
          |  UNION ALL SELECT y FROM tri
          |  UNION ALL SELECT z FROM tri
          |), tc AS (
          |  SELECT node, count(*) AS triangles FROM memb GROUP BY node
          |)
          |SELECT d.node, d.deg AS degree,
          |       coalesce(tc.triangles, 0) AS triangles,
          |       CASE WHEN d.deg >= 2 THEN
          |         round(2.0 * coalesce(tc.triangles, 0)
          |               / (d.deg * (d.deg - 1.0)), 6)
          |       ELSE 0.0 END AS clustering
          |FROM deg d LEFT JOIN tc USING (node)""".stripMargin,

      // nearest-rank-lower order statistics replicated directly: the
      // GK sketch at eps = 0 answers rank 1 + floor(q*(n-1)) exactly
      "q_stats_quantiles" ->
        """WITH base AS (
          |  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
          |), r AS (
          |  SELECT lang, v,
          |    row_number() OVER (PARTITION BY lang ORDER BY v) AS rn,
          |    count(*) OVER (PARTITION BY lang) AS cnt
          |  FROM base
          |), qs(q) AS (
          |  VALUES (0.0), (0.25), (0.5), (0.75), (1.0)
          |)
          |SELECT lang, CAST(q AS DOUBLE) AS q, v AS value
          |FROM r JOIN qs ON rn = 1 + floor(q * (cnt - 1))""".stripMargin,

      // same distinct-token score; DuckDB's quantile_cont matches Spark's
      // exact percentile after the shared round-6 discipline
      "q_curation_quantile" ->
        """WITH s AS (
          |  SELECT doc_id,
          |    len(list_distinct(string_split(text, ' ')))::DOUBLE AS n_types
          |  FROM documents
          |)
          |SELECT doc_id, n_types FROM s
          |WHERE n_types >= round(
          |  (SELECT quantile_cont(n_types, 0.6) FROM s), 6)""".stripMargin,

      "q_text_pack" ->
        """WITH t AS (
          |  SELECT lang, doc_id, len(string_split(text, ' ')) AS tokens
          |  FROM documents
          |), c AS (
          |  SELECT lang, doc_id, tokens,
          |    COALESCE(CAST(sum(tokens) OVER (PARTITION BY lang
          |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND 1 PRECEDING) AS BIGINT), 0) AS s
          |  FROM t
          |)
          |SELECT lang, s // 2048 AS pack_id, count(*) AS n_docs,
          |  CAST(sum(tokens) AS BIGINT) AS pack_tokens,
          |  min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
          |FROM c GROUP BY 1, 2""".stripMargin,

      "q_multimodal_meta" ->
        """SELECT doc_id AS id, 'text/plain' AS mime, source,
          |       strlen(text)::BIGINT AS n_bytes
          |FROM documents""".stripMargin,

      "q_events_asof" ->
        """SELECT p.user_id, p.event_id, c.click_id
          |FROM (SELECT user_id, event_id, ts FROM events
          |      WHERE event_type = 'purchase') p
          |ASOF LEFT JOIN
          |     (SELECT user_id, event_id AS click_id, ts FROM events
          |      WHERE event_type = 'click') c
          |ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

      // DuckDB 1.0 has no BLOB substring; the docs are ASCII so char
      // slicing before encode() is byte-identical. hex() on both sides —
      // raw binary crashes the driver's pandas sort (unhashable bytearray)
      "q_multimodal_frames" ->
        """SELECT doc_id AS id, i AS frame_index,
          |       hex(encode(substring(text, CAST(i * 64 + 1 AS BIGINT),
          |                            CAST(64 AS BIGINT)))) AS frame_hex
          |FROM documents,
          |     LATERAL unnest(range(0, greatest(
          |       CAST(ceil(octet_length(encode(text)) / 64.0) AS INT), 1))) AS t(i)
          |WHERE i % 3 = 0""".stripMargin,

      // replays the fixture's integer sample grammar (group base +
      // one perturbed frame), exact Long frame energies, the 64
      // consecutive-frame comparison bits, then ALL-PAIRS Hamming —
      // ground truth the banded join must reproduce exactly
      "q_multimodal_audiodup" ->
        """WITH params AS (
          |  SELECT doc_id::BIGINT AS id, (doc_id % 40)::BIGINT AS g,
          |         (doc_id % 65)::BIGINT AS p
          |  FROM documents WHERE doc_id < 400),
          |samples AS (
          |  SELECT id, t // 32 AS f,
          |    ((g * 37 + (t * t) % 97 + (t % 17) * (g % 11)
          |      + CASE WHEN t // 32 = p THEN 1 ELSE 0 END) % 256
          |     - 128) AS v
          |  FROM params, LATERAL unnest(range(0, 2080)) AS s(t)),
          |energy AS MATERIALIZED (
          |  SELECT id, f, SUM(v * v)::BIGINT AS e
          |  FROM samples GROUP BY 1, 2),
          |bits AS MATERIALIZED (
          |  SELECT a.id, a.f AS k,
          |         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
          |  FROM energy a JOIN energy b
          |    ON a.id = b.id AND b.f = a.f + 1)
          |SELECT x.id AS id_a, y.id AS id_b,
          |       SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
          |         ::BIGINT AS hamming
          |FROM bits x JOIN bits y ON x.k = y.k AND x.id < y.id
          |GROUP BY 1, 2
          |HAVING SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 4"""
          .stripMargin,

      // every pixel → block sum → consecutive-comparison bit of the
      // fixture grammar replayed, then ALL-PAIRS aligned-sequence
      // ground truth (per-frame bit mismatches, max over frames)
      "q_multimodal_videodup" ->
        """WITH params AS (
          |  SELECT doc_id::BIGINT AS id, (doc_id % 20)::BIGINT AS g,
          |         (doc_id % 63)::BIGINT AS pb,
          |         (doc_id % 4)::BIGINT AS pf
          |  FROM documents WHERE doc_id < 200),
          |pix AS (
          |  SELECT id, f, (y // 2) * 8 + (x // 2) AS k,
          |    ((g * 37 + f * 29 + (x * x + 3 * y) % 97
          |      + (y % 5) * (g % 7)
          |      + CASE WHEN f = pf
          |             AND (y // 2) * 8 + (x // 2) = pb
          |        THEN 1 ELSE 0 END) % 256) AS v
          |  FROM params, LATERAL unnest(range(0, 4)) AS ff(f),
          |       LATERAL unnest(range(0, 16)) AS yy(y),
          |       LATERAL unnest(range(0, 16)) AS xx(x)),
          |blocksum AS MATERIALIZED (
          |  SELECT id, f, k, SUM(v)::BIGINT AS s
          |  FROM pix GROUP BY 1, 2, 3),
          |bits AS MATERIALIZED (
          |  SELECT a.id, a.f, a.k,
          |         CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
          |  FROM blocksum a JOIN blocksum b
          |    ON a.id = b.id AND a.f = b.f AND b.k = a.k + 1),
          |framed AS (
          |  SELECT x.id AS id_a, y.id AS id_b, x.f,
          |         SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END)
          |           AS fh
          |  FROM bits x JOIN bits y
          |    ON x.f = y.f AND x.k = y.k AND x.id < y.id
          |  GROUP BY 1, 2, 3)
          |SELECT id_a, id_b, MAX(fh)::BIGINT AS hamming
          |FROM framed GROUP BY 1, 2
          |HAVING MAX(fh) <= 4""".stripMargin,

      // conformance: cast + typed NULL fill + declared order
      "q_pipeline_conform" ->
        """SELECT doc_id::BIGINT AS doc_id, lang,
          |  n_chars::DOUBLE AS n_chars,
          |  NULL::INT AS quality_tier
          |FROM documents""".stripMargin,

      // the batch face of the streaming first-seen tagger: global
      // (ts, event_id)-order first-per-key, exactly row_number = 1
      "q_pipeline_firstseen" ->
        """SELECT event_id, user_id, event_type,
          |  (row_number() OVER (PARTITION BY user_id, event_type
          |                      ORDER BY ts, event_id) = 1)
          |    AS is_first
          |FROM events""".stripMargin,

      // the two-stage salted aggregate re-associates the sum, so the
      // value column is decimal end-to-end (exact, order-independent)
      // and only the final presentation casts to double
      "q_pipeline_salted_stats" ->
        """SELECT l_returnflag,
          |  count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS "sum",
          |  CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS "min",
          |  CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS "max"
          |FROM lineitem
          |GROUP BY 1""".stripMargin,

      "q_agg_pricing" ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_base_price,
          |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |    AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate < TIMESTAMP '1997-09-01'
          |GROUP BY 1, 2""".stripMargin,

      // same four grouping sets; per-column GROUPING() markers so a
      // rolled-up NULL is distinguishable from a data NULL in both
      // engines
      "q_agg_cube" ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
          |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
          |  count(*) AS n,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_qty
          |FROM lineitem
          |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

      "q_join_revenue" ->
        """SELECT n.n_name AS n_name,
          |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue,
          |  count(*) AS n_orders
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY 1""".stripMargin,

      // the bloom pre-filter must be invisible in the result: the
      // oracle is the PLAIN join over the filtered dimension
      "q_join_bloom" ->
        """SELECT n.n_name AS n_name,
          |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue,
          |  count(*) AS n_orders
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |  AND c.c_mktsegment = 'BUILDING'
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY 1""".stripMargin,

      // same rollup as q_join_revenue — the bucketed path must agree
      "q_join_bucketed" ->
        """SELECT n.n_name AS n_name,
          |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue,
          |  count(*) AS n_orders
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY 1""".stripMargin,

      // same rollup as q_join_revenue — the salted plan must not change
      // the result
      "q_join_salted" ->
        """SELECT n.n_name AS n_name,
          |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS revenue,
          |  count(*) AS n_orders
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY 1""".stripMargin,

      "q_join_semi" ->
        """WITH active AS (
          |  SELECT c_mktsegment, count(*) AS n_active
          |  FROM customer c
          |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          |  GROUP BY 1
          |), inactive AS (
          |  SELECT c_mktsegment, count(*) AS n_inactive
          |  FROM customer c
          |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          |  GROUP BY 1
          |)
          |SELECT coalesce(a.c_mktsegment, i.c_mktsegment) AS c_mktsegment,
          |       coalesce(a.n_active, 0) AS n_active,
          |       coalesce(i.n_inactive, 0) AS n_inactive
          |FROM active a FULL OUTER JOIN inactive i USING (c_mktsegment)""".stripMargin,

      // conditional aggregation IS the pivot contract — same decimal
      // cell sums, same rounded display cast
      "q_reshape_pivot" ->
        """SELECT user_id,
          |  round(sum(CASE WHEN event_type = 'click'
          |    THEN CAST(round(value, 9) AS DECIMAL(28,9)) END), 6)::DOUBLE AS click,
          |  round(sum(CASE WHEN event_type = 'error'
          |    THEN CAST(round(value, 9) AS DECIMAL(28,9)) END), 6)::DOUBLE AS error,
          |  round(sum(CASE WHEN event_type = 'purchase'
          |    THEN CAST(round(value, 9) AS DECIMAL(28,9)) END), 6)::DOUBLE AS purchase,
          |  round(sum(CASE WHEN event_type = 'signup'
          |    THEN CAST(round(value, 9) AS DECIMAL(28,9)) END), 6)::DOUBLE AS signup,
          |  round(sum(CASE WHEN event_type = 'view'
          |    THEN CAST(round(value, 9) AS DECIMAL(28,9)) END), 6)::DOUBLE AS view
          |FROM events GROUP BY user_id""".stripMargin,

      "q_reshape_melt" ->
        """SELECT l_orderkey, l_linenumber,
          |  'l_quantity' AS measure, l_quantity AS amount FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber,
          |  'l_extendedprice', l_extendedprice FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber,
          |  'l_discount', l_discount FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber,
          |  'l_tax', l_tax FROM lineitem""".stripMargin,

      "q_set_ops" ->
        """SELECT CAST(nationkey AS INT) AS nationkey FROM (
          |  SELECT c_nationkey AS nationkey FROM customer
          |  UNION
          |  SELECT s_nationkey AS nationkey FROM supplier
          |)
          |EXCEPT
          |SELECT CAST(n_nationkey AS INT) FROM nation WHERE n_regionkey = 0""".stripMargin,

      // compaction preserves content exactly
      "q_layout_compact" ->
        "SELECT doc_id, text, lang, source, n_chars FROM documents",

      "q_layout_zorder" ->
        s"""SELECT l_orderkey, l_linenumber,
           |  ($zorderExprSql) AS zval
           |FROM lineitem""".stripMargin,

      // same HRW construction: md5-48 score per (key, shard), argmax
      // via a [score, -s] list sort — the (score desc, s asc) tie-break
      "q_layout_shards" ->
        """SELECT doc_id,
          |  CAST(-((list_sort(list_transform(range(16), s ->
          |    [('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
          |        CAST(s AS VARCHAR)), 1, 12))::BIGINT, -s]),
          |    'DESC'))[1][2]) AS INT) AS shard
          |FROM documents""".stripMargin,

      // same null-safe column compare (IS DISTINCT FROM ↔ <=>) over the
      // same full-outer join; concat_ws skips NULL args in both engines
      "q_layout_diff" ->
        """WITH o AS (
          |  SELECT doc_id, text, lang FROM documents
          |  WHERE doc_id % 11 <> 3
          |), n AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END
          |      AS text,
          |    lang
          |  FROM documents WHERE doc_id % 7 <> 0
          |), j AS (
          |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          |    o.doc_id IS NOT NULL AS in_old,
          |    n.doc_id IS NOT NULL AS in_new,
          |    o.text IS DISTINCT FROM n.text AS d_text,
          |    o.lang IS DISTINCT FROM n.lang AS d_lang
          |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
          |)
          |SELECT doc_id,
          |  CASE WHEN NOT in_old THEN 'added'
          |       WHEN NOT in_new THEN 'removed'
          |       ELSE 'changed' END AS status,
          |  CASE WHEN in_old AND in_new THEN concat_ws(',',
          |    CASE WHEN d_text THEN 'text' END,
          |    CASE WHEN d_lang THEN 'lang' END) ELSE '' END
          |    AS changed_cols,
          |  CASE WHEN in_old AND in_new THEN
          |    (CASE WHEN d_text THEN 1 ELSE 0 END +
          |     CASE WHEN d_lang THEN 1 ELSE 0 END)
          |  ELSE 0 END AS n_changed
          |FROM j
          |WHERE (NOT in_old) OR (NOT in_new) OR d_text OR d_lang""".stripMargin,

      // same latest-change-wins reduction (max seq per key; the
      // fixture's seqs are unique per key so row_number == max_by),
      // anti-joined kept rows + upserted payloads
      "q_layout_apply" ->
        """WITH snap AS (
          |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          |  FROM orders WHERE o_orderkey % 4 <> 0
          |), chg AS (
          |  SELECT o_orderkey, 1 AS seq, 'upsert' AS op, o_custkey,
          |         'U' AS o_orderstatus,
          |         o_totalprice + 10 AS o_totalprice
          |  FROM orders WHERE o_orderkey % 3 = 0
          |  UNION ALL
          |  SELECT o_orderkey, 2, 'upsert', o_custkey, 'V',
          |         o_totalprice + 20
          |  FROM orders WHERE o_orderkey % 9 = 0
          |  UNION ALL
          |  SELECT o_orderkey, 3, 'delete', NULL, NULL, NULL
          |  FROM orders WHERE o_orderkey % 5 = 0
          |), latest AS (
          |  SELECT o_orderkey, op, o_custkey, o_orderstatus,
          |         o_totalprice
          |  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
          |                    ORDER BY seq DESC) AS rn FROM chg)
          |  WHERE rn = 1
          |)
          |SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus,
          |       s.o_totalprice
          |FROM snap s LEFT JOIN latest l ON s.o_orderkey = l.o_orderkey
          |WHERE l.o_orderkey IS NULL
          |UNION ALL
          |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          |FROM latest WHERE op = 'upsert'""".stripMargin,

      "q_sort_topk" ->
        """SELECT l_orderkey, l_linenumber, l_extendedprice
          |FROM lineitem
          |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
          |LIMIT 100""".stripMargin,

      "q_window_topn" ->
        """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders
          |) WHERE rn <= 3""".stripMargin
    )
    // the config-driven replays compile to the identical operator
    // chains, so each runs under its hand-written twin's oracle
    // verbatim
    base + ("q_pipeline_cfg" -> base("q_pipeline_curate")) +
      ("q_pipeline_dedup_store" -> base("q_dedup_store")) +
      ("q_pipeline_ann" -> base("q_sim_ivf_indexed")) +
      ("q_pipeline_profile" -> base("q_stats_profile_shards")) +
      ("q_pipeline_apply" -> base("q_layout_apply")) +
      ("q_layout_apply_bucketed" -> base("q_layout_apply")) +
      ("q_pipeline_suppress" -> base("q_stats_kanon_suppress")) +
      ("q_pipeline_psi" -> base("q_stats_psi")) +
      ("q_pipeline_multimodal" -> base("q_multimodal_meta")) +
      ("q_pipeline_audiodup" -> base("q_multimodal_audiodup")) +
      ("q_pipeline_videodup" -> base("q_multimodal_videodup")) +
      ("q_pipeline_ttest" -> base("q_stats_ttest")) +
      ("q_pipeline_hits" -> base("q_graph_hits")) +
      ("q_pipeline_contract" -> base("q_pipeline_curate")) +
      ("q_pipeline_distinct" -> base("q_stats_distinct")) +
      ("q_pipeline_mixture" -> base("q_sample_mixture")) +
      ("q_pipeline_split_safe" -> base("q_sample_split_safe")) +
      ("q_pipeline_scd2" -> base("q_events_scd2")) +
      ("q_pipeline_melt" -> base("q_reshape_melt")) +
      ("q_pipeline_retention" -> base("q_events_retention")) +
      ("q_pipeline_transitions" -> base("q_events_transitions")) +
      ("q_pipeline_cap" -> base("q_sample_cap")) +
      ("q_pipeline_budget" -> base("q_curation_budget")) +
      ("q_pipeline_cube" -> base("q_agg_cube")) +
      ("q_pipeline_frontier" -> base("q_crawl_frontier")) +
      ("q_pipeline_clusters" -> base("q_dedup_clusters")) +
      ("q_pipeline_join" -> base("q_join_revenue")) +
      ("q_pipeline_topk" -> base("q_sort_topk")) +
      ("q_pipeline_asof" -> base("q_events_asof")) +
      ("q_pipeline_range" -> base("q_events_range")) +
      ("q_pipeline_bloom" -> base("q_join_bloom")) +
      // a salted join must equal the plain join row-for-row, so the
      // replay shares q_join_revenue's oracle like its twin does
      ("q_pipeline_salted" -> base("q_join_revenue")) +
      ("q_pipeline_skewreport" -> base("q_join_skewreport")) +
      ("q_pipeline_bfs" -> base("q_graph_bfs")) +
      ("q_pipeline_setops" -> base("q_set_ops")) +
      ("q_pipeline_fns" -> base("q_fn_root")) +
      ("q_pipeline_harmonic" -> base("q_graph_harmonic")) +
      ("q_pipeline_sssp" -> base("q_graph_sssp")) +
      ("q_pipeline_domaingraph_psl" -> base("q_graph_domaingraph_psl")) +
      ("q_pipeline_triangles" -> base("q_graph_triangles")) +
      ("q_pipeline_kcore" -> base("q_graph_kcore")) +
      ("q_pipeline_lpa" -> base("q_graph_lpa")) +
      ("q_pipeline_assort" -> base("q_graph_assortativity")) +
      ("q_pipeline_pagerank" -> base("q_graph_pagerank")) +
      ("q_pipeline_ppr" -> base("q_graph_ppr")) +
      ("q_pipeline_components" -> base("q_graph_components")) +
      ("q_pipeline_adamic" -> base("q_graph_adamic")) +
      ("q_pipeline_walks" -> base("q_graph_walks")) +
      ("q_pipeline_walks_seeded" -> base("q_graph_walks_seeded")) +
      ("q_pipeline_walk_pairs" -> base("q_graph_walk_pairs")) +
      ("q_pipeline_walk_negatives" -> base("q_graph_walk_negatives")) +
      ("q_pipeline_node2vec" -> base("q_graph_node2vec")) +
      ("q_pipeline_node2vec_seeded" ->
        base("q_graph_node2vec_seeded")) +
      ("q_pipeline_embed_loss" -> base("q_graph_embed_loss")) +
      ("q_pipeline_embeddings" -> base("q_graph_embeddings")) +
      ("q_pipeline_avro" -> base("q_source_avro")) +
      ("q_pipeline_closeness" -> base("q_graph_closeness")) +
      ("q_pipeline_nf" -> base("q_graph_nf")) +
      ("q_pipeline_topn" -> base("q_window_topn")) +
      ("q_pipeline_rank_hosts" -> base("q_graph_pagerank_hosts")) +
      // register max-merge is exact, so the sharded path shares the
      // direct oracle verbatim
      ("q_stats_distinct_shards" -> base("q_stats_distinct"))
  }
}
