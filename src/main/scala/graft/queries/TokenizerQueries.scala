package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer application and collocation statistics over `documents` —
  * the inference-side complement to [[graft.ml.Bpe]]'s trainer (q120) and
  * the PMI collocation mining a corpus-analysis pipeline runs before
  * vocabulary decisions.
  *
  * Both fully oracle-checked: the BPE encode is a fixed public merge table
  * applied as a row-local fold (exact integer outputs), and PMI keeps one
  * textually-identical IEEE expression in both engines so the rounded
  * scores agree bit-for-bit.
  */
object TokenizerQueries {

  /** Symbol separator inside a word during merge application — same
    * convention as [[graft.ml.Bpe]] (U+0001 never occurs in text). */
  private val SEP = "\u0001"

  /** A fixed, ordered BPE merge table (common English pairs, later merges
    * building on earlier ones — th+e only fires after t+h). Applying a
    * *given* tokenizer is a distinct operator from training one (q120):
    * production pipelines encode petabytes with a frozen vocab. */
  private val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "e" -> "n",
    "t" -> "o", "o" -> "u", "i" -> "s", "a" -> "t", "e" -> "s")

  /** Encode one word column: chars joined by SEP, then each merge applied
    * with [[graft.ml.Bpe.mergeFold]]'s token-level left-to-right
    * non-overlapping semantics (whole-symbol matching — a string-level
    * `replace` would corrupt symbols whose SUFFIX equals a later rule's
    * left side, e.g. th+e then e+r on "there"; BpeSpec pins the case). */
  private def encode(w: Column): Column =
    merges.foldLeft(array_join(array_remove(split(w, ""), ""), SEP)) {
      case (acc, (l, r)) => graft.ml.Bpe.mergeFold(acc, l, r)
    }

  /** The same encode as DuckDB SQL over a lambda variable `w` — the
    * mergeFold semantics as nested list_reduce calls (append r without a
    * separator when the accumulator's last complete symbol is l). */
  private def duckEncode: String =
    merges.zipWithIndex.foldLeft(
      "array_to_string(regexp_split_to_array(w, ''), chr(1))") {
      case (acc, ((l, r), i)) =>
        s"""list_reduce(string_split($acc, chr(1)),
           |  (a$i, x$i) -> CASE WHEN (a$i = '$l' OR ends_with(a$i, chr(1) || '$l'))
           |                          AND x$i = '$r'
           |                     THEN a$i || '$r' ELSE a$i || chr(1) || x$i END)""".stripMargin
    }

  private def words(c: Column): Column =
    filter(split(lower(c), "\\s+"), w => w =!= "")

  val defs: Seq[QueryDef] = Seq(

    // Apply a frozen BPE tokenizer to every document: per-doc word count,
    // total token count, and distinct-token count. Entirely row-local
    // (embarrassingly parallel — the 100 TB encode pass has zero shuffles
    // before the final presentation sort): the merge table ships as
    // literals inside the plan, never as a join side.
    QueryDef.sql(
      "q121_bpe_encode",
      s"""WITH d AS (SELECT doc_id,
         |             list_filter(string_split_regex(lower(text), '\\s+'),
         |                         w -> w <> '') AS ws
         |           FROM documents),
         |  e AS (SELECT doc_id, len(ws) AS n_words,
         |               list_transform(ws,
         |                 w -> string_split($duckEncode, chr(1))) AS toks
         |        FROM d)
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |       COALESCE(CAST(list_sum(list_transform(toks, t -> len(t)))
         |                     AS BIGINT), 0) AS n_tokens,
         |       CAST(len(list_distinct(flatten(toks))) AS BIGINT)
         |         AS n_distinct_tokens
         |FROM e ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ws = words(col("text"))
      val toks = transform(ws, w => split(encode(w), SEP))
      t(s, d, "documents")
        .select(col("doc_id"), ws.as("ws"), toks.as("toks"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          coalesce(aggregate(col("toks"), lit(0L),
            (acc, tk) => acc + size(tk)), lit(0L)).as("n_tokens"),
          size(array_distinct(flatten(col("toks")))).cast("long")
            .as("n_distinct_tokens"))
        .orderBy("doc_id")
    },

    // Top-25 adjacent-word collocations by PMI (pair count >= 5): the
    // classic corpus-linguistics signal for multi-word expressions.
    // Bigrams come from zipped array slices (row-local), counts are exact
    // integers aggregated map-side; the unigram-stats join is a shuffle
    // equi-join on the word — the stats side is Zipf-small, never the
    // corpus (same posture as TF-IDF/BM25). The PMI double is computed
    // from ONE parenthesization in both engines, so IEEE determinism
    // carries the rounded score.
    QueryDef.sql(
      "q124_pmi_collocations",
      """WITH w AS (SELECT doc_id,
        |             list_filter(string_split_regex(lower(text), '\s+'),
        |                         x -> x <> '') AS ws
        |           FROM documents),
        |  uni AS (SELECT unnest(ws) AS tok FROM w),
        |  cx AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
        |  n AS (SELECT count(*) AS n FROM uni),
        |  bi AS (SELECT unnest(ws[1:-2]) AS x, unnest(ws[2:-1]) AS y
        |         FROM w WHERE len(ws) >= 2),
        |  cxy AS (SELECT x, y, count(*) AS pair_count FROM bi
        |          GROUP BY x, y HAVING count(*) >= 5),
        |  b AS (SELECT count(*) AS b FROM bi)
        |SELECT cxy.x, cxy.y, pair_count,
        |       round(ln((CAST(pair_count AS DOUBLE) * n.n * n.n) /
        |                (CAST(b.b AS DOUBLE) * ca.c * cb.c)), 4) AS pmi
        |FROM cxy
        |JOIN cx ca ON cxy.x = ca.tok
        |JOIN cx cb ON cxy.y = cb.tok
        |CROSS JOIN n CROSS JOIN b
        |ORDER BY pmi DESC, cxy.x, cxy.y
        |LIMIT 25""".stripMargin) { (s, d) =>
      val wdf = t(s, d, "documents").select(words(col("text")).as("ws"))
      val uni = wdf.select(explode(col("ws")).as("tok"))
      val cx = uni.groupBy("tok").agg(count(lit(1)).as("c"))
      val nDf = uni.agg(count(lit(1)).as("n"))
      val sz = size(col("ws"))
      val bi = wdf.filter(sz >= 2)
        .select(explode(zip_with(
          slice(col("ws"), lit(1), sz - 1),
          slice(col("ws"), lit(2), sz - 1),
          (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
      val cxy = bi.groupBy("x", "y").agg(count(lit(1)).as("pair_count"))
        .filter(col("pair_count") >= 5)
      val bDf = bi.agg(count(lit(1)).as("b"))
      // identical parenthesization to the oracle: ((cxy*n)*n) / ((b*ca)*cb)
      val pmi = round(log(
        (col("pair_count").cast("double") * col("n") * col("n")) /
          (col("b").cast("double") * col("ca") * col("cb"))), 4)
      cxy
        .join(cx.select(col("tok").as("x"), col("c").as("ca")), Seq("x"))
        .join(cx.select(col("tok").as("y"), col("c").as("cb")), Seq("y"))
        .crossJoin(broadcast(nDf))
        .crossJoin(broadcast(bDf))
        .select(col("x"), col("y"), col("pair_count"), pmi.as("pmi"))
        .orderBy(col("pmi").desc, col("x"), col("y"))
        .limit(25)
    },

    // Tokenizer fertility report — the per-source efficiency numbers a
    // vocab decision is made on (tokens/word = fertility, chars/token =
    // compression; a vocabulary that tokenizes one source 2× less
    // efficiently than another skews that source's effective epoch count).
    // Reuses q121's frozen merge table and row-local encode fold, then ONE
    // per-source aggregate of exact integer sums — the 100 TB shape is a
    // narrow encode pass plus a 4-row rollup, zero joins. Ratios are
    // rounded from identical integer inputs in both engines.
    QueryDef.sql(
      "q160_token_fertility",
      s"""WITH d AS (SELECT source,
         |             list_filter(string_split_regex(lower(text), '\\s+'),
         |                         w -> w <> '') AS ws
         |           FROM documents),
         |  e AS (SELECT source, len(ws) AS n_words,
         |               COALESCE(list_sum(list_transform(ws,
         |                 w -> len(string_split($duckEncode, chr(1))))), 0)
         |                 AS n_tokens,
         |               COALESCE(list_sum(list_transform(ws, w -> length(w))), 0)
         |                 AS n_chars
         |        FROM d)
         |SELECT source,
         |       CAST(sum(n_words) AS BIGINT) AS n_words,
         |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       round(CAST(sum(n_tokens) AS DOUBLE) / sum(n_words), 6)
         |         AS fertility,
         |       round(CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens), 6)
         |         AS chars_per_token
         |FROM e GROUP BY source
         |ORDER BY source""".stripMargin) { (s, d) =>
      val ws = words(col("text"))
      t(s, d, "documents")
        .select(col("source"), ws.as("ws"))
        .select(col("source"),
          size(col("ws")).cast("long").as("n_words"),
          coalesce(aggregate(col("ws"), lit(0L),
            (acc, w) => acc + size(split(encode(w), SEP))), lit(0L))
            .as("n_tokens"),
          coalesce(aggregate(col("ws"), lit(0L),
            (acc, w) => acc + length(w)), lit(0L)).as("n_chars"))
        .groupBy("source")
        .agg(sum("n_words").as("n_words"),
          sum("n_tokens").as("n_tokens"),
          sum("n_chars").as("n_chars"),
          round(sum("n_tokens").cast("double") / sum("n_words"), 6)
            .as("fertility"),
          round(sum("n_chars").cast("double") / sum("n_tokens"), 6)
            .as("chars_per_token"))
        .orderBy("source")
    },

    // BPE id-roundtrip — the DECODE half of the tokenizer surface, in its
    // production shape: encode rows to token strings, intern a dense
    // integer vocab (the id table a trainer ships), re-express every
    // position as an id, then DECODE BY JOIN (id → token) and reassemble
    // each word in position order. n_roundtrip_ok must equal n_docs —
    // tautological in the oracle's SQL, but the Spark side actually runs
    // the full id pipeline, so a corrupted vocab join, a dropped
    // position, or a decode-order bug breaks the count and fails the
    // hash gate (the q89 flag pattern). n_tokens and vocab_size are
    // recomputed independently by DuckDB via the SQL encode fold. Scale:
    // encode is row-local; both vocab joins key on a Zipf-bounded token
    // set; reassembly groups by (doc, word) — distributes like the corpus.
    QueryDef.sql(
      "q184_bpe_roundtrip",
      s"""WITH d AS (SELECT doc_id, source,
         |             list_filter(string_split_regex(lower(text), '\\s+'),
         |                         w -> w <> '') AS ws
         |           FROM documents),
         |  e AS (SELECT doc_id, source,
         |               list_transform(ws,
         |                 w -> string_split($duckEncode, chr(1))) AS toks
         |        FROM d),
         |  v AS (SELECT count(DISTINCT t2.tok) AS vocab_size
         |        FROM (SELECT unnest(flatten(toks)) AS tok FROM e) t2)
         |SELECT source,
         |       count(*) AS n_docs,
         |       COALESCE(CAST(sum(list_sum(list_transform(toks, t -> len(t))))
         |                     AS BIGINT), 0) AS n_tokens,
         |       count(*) AS n_roundtrip_ok,
         |       v.vocab_size
         |FROM e, v
         |GROUP BY source, v.vocab_size
         |ORDER BY source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val occ = t(s, d, "documents")
        .select(col("doc_id"), col("source"), words(col("text")).as("ws"))
        .select(col("doc_id"), col("source"),
          posexplode(col("ws")).as(Seq("wi", "w")))
      // DICTIONARY encode: the 15-rule merge fold runs once per DISTINCT
      // word, not once per occurrence — the corpus word frequency follows
      // Zipf, so this cuts the encode work by the type/token ratio
      // (measured 9.0 s → well under 1 s at sf0.1; at 100 TB the distinct
      // side is the only place the fold ever runs, shipped as a broadcast)
      val wordToks = occ.select("w").distinct()
        .select(col("w"), split(encode(col("w")), SEP).as("tk"))
        .localCheckpoint(true)
      // one position row per (DISTINCT word, token index) — the decode,
      // the id round trip, and the equality check are all functions of
      // the WORD alone, so the whole verify pipeline runs over the
      // Zipf-bounded vocabulary and never shuffles a corpus-wide frame
      // (round-13 sf10 probe: the previous per-occurrence
      // collect_list/sort/concat groupBy shuffled ~10× the rows at 10×
      // the data and spilled — exponent 1.14; per-word it is
      // corpus-size-independent)
      val pos = wordToks
        .select(col("w"), posexplode(col("tk")).as(Seq("ti", "tok")))
        .localCheckpoint(true) // feeds the vocab intern AND both joins
      // dense id table (the rank window runs inside this eager checkpoint
      // over the Zipf-bounded VOCAB frame, never the corpus)
      val vocab = pos.select("tok").distinct()
        .withColumn("id", row_number().over(Window.orderBy("tok")).cast("long"))
        .localCheckpoint(true)
      val vocabSize = vocab.agg(count(lit(1)).as("vocab_size"))
      val ids = pos.join(broadcast(vocab), "tok")
        .select("w", "ti", "id")
      val decodedW = ids
        .join(broadcast(vocab.select(col("id"), col("tok").as("tok2"))), "id")
        .groupBy("w")
        .agg(concat_ws("", array_sort(collect_list(struct(col("ti"),
          col("tok2")))).getField("tok2")).as("w2"),
          count(lit(1)).as("n_toks"))
        .select(col("w"), (col("w") === col("w2")).as("w_ok"),
          col("n_toks"))
      // corpus side: one broadcast join + a per-doc sum — no wide shuffle
      val perDoc = occ.join(broadcast(decodedW), "w")
        .groupBy("doc_id", "source")
        .agg((count(lit(1)) === sum(when(col("w_ok"), 1L).otherwise(0L)))
          .as("rt_ok"),
          sum("n_toks").as("n_tokens"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("n_tokens"),
          sum(when(col("rt_ok"), 1L).otherwise(0L)).as("n_roundtrip_ok"))
        .crossJoin(broadcast(vocabSize))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_roundtrip_ok"), col("vocab_size"))
        .orderBy("source")
    },

    // Optimal dictionary segmentation — the WordPiece/unigram-LM family
    // member BPE (q120/q121/q184) doesn't cover: instead of replaying a
    // merge history, each word is segmented into the GLOBALLY best piece
    // sequence under an exact integer objective (fewest pieces, ties by
    // highest summed piece frequency, then lowest mask — all integers, no
    // float scores to diverge on). Words are short (≤8 chars here), so the
    // DP is run as bounded mask enumeration: a word of length L has 2^(L-1)
    // segmentations, each mask's boundary set decoded with bit arithmetic
    // inside higher-order functions — one explode chain, no joins wider
    // than (word × mask × piece), vocabulary-bounded at any corpus scale
    // (pieces are substrings of length ≤4; masks with a longer gap are
    // discarded as out-of-vocabulary). The piece-frequency table is the
    // occurrence count over the vocabulary itself, broadcast into the
    // scoring join.
    QueryDef.sql(
      "q198_wordpiece_dp",
      """WITH raw AS (SELECT DISTINCT
        |               unnest(string_split(trim(regexp_replace(regexp_replace(
        |                 lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                 ' +', ' ', 'g')), ' ')) AS tok
        |             FROM documents WHERE text IS NOT NULL),
        |     words AS (SELECT tok, length(tok) AS len FROM raw WHERE tok <> ''),
        |     occ AS (SELECT unnest(flatten(list_transform(generate_series(1, len),
        |                      s -> list_transform(generate_series(1, least(4, len - s + 1)),
        |                             l -> substr(tok, s, l))))) AS piece
        |             FROM words),
        |     freq AS (SELECT piece, CAST(count(*) AS BIGINT) AS f
        |              FROM occ GROUP BY piece),
        |     masks AS (SELECT tok, len,
        |                      unnest(generate_series(0, (1 << (len - 1)) - 1)) AS mask
        |               FROM words),
        |     segall AS (SELECT tok, mask,
        |                    list_transform(generate_series(1, len(b) - 1),
        |                      j -> substr(tok, b[j] + 1, b[j + 1] - b[j])) AS pieces
        |             FROM (SELECT tok, mask,
        |                          list_prepend(0, list_append(
        |                            list_filter(generate_series(1, len - 1),
        |                              i -> ((mask >> (i - 1)) & 1) = 1), len)) AS b
        |                   FROM masks)),
        |     -- validity BEFORE the freq join: a >4-char piece is
        |     -- out-of-vocabulary, and the inner join would silently DROP
        |     -- it (scoring the remnant) instead of disqualifying the mask
        |     seg AS (SELECT * FROM segall
        |             WHERE list_max(list_transform(pieces, p -> length(p))) <= 4),
        |     scored AS (SELECT s.tok, s.mask,
        |                       CAST(len(s.pieces) AS BIGINT) AS n_pieces,
        |                       array_to_string(s.pieces, '|') AS seg,
        |                       CAST(sum(f.f) AS BIGINT) AS score
        |                FROM seg s, unnest(s.pieces) AS p(piece)
        |                JOIN freq f ON f.piece = p.piece
        |                GROUP BY s.tok, s.mask, s.pieces)
        |SELECT tok, n_pieces, seg, score
        |FROM (SELECT tok, n_pieces, seg, score,
        |             row_number() OVER (PARTITION BY tok
        |               ORDER BY n_pieces, score DESC, mask) AS rn
        |      FROM scored)
        |WHERE rn = 1
        |ORDER BY tok""".stripMargin) { (s, d) =>
      val words = t(s, d, "documents").filter(col("text").isNotNull)
        .select(explode(split(normText(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "").distinct()
        .withColumn("len", length(col("tok")))
      val freq = words
        .select(explode(expr(
          """flatten(transform(sequence(1, len),
            |  s -> transform(sequence(1, least(4, len - s + 1)),
            |         l -> substring(tok, s, l))))""".stripMargin)).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("f"))
      val masks = words.select(col("tok"), col("len"),
        explode(expr("sequence(CAST(0 AS BIGINT), CAST(shiftleft(1, len - 1) AS BIGINT) - 1)"))
          .as("mask"))
      // boundary set: [0] ++ set bits of mask ++ [len]; len=1 words have
      // mask 0 only and the filter frame is vacuous either way
      val seg = masks
        .withColumn("b", expr(
          """concat(array(0),
            |  filter(sequence(1, greatest(len - 1, 1)),
            |    i -> i < len AND (mask & CAST(shiftleft(1, i - 1) AS BIGINT)) != 0),
            |  array(len))""".stripMargin))
        .withColumn("pieces", expr(
          """transform(sequence(1, size(b) - 1),
            |  j -> substring(tok, element_at(b, j) + 1,
            |                 element_at(b, j + 1) - element_at(b, j)))""".stripMargin))
        // validity BEFORE the freq join (mirrors the oracle's seg CTE): an
        // out-of-vocabulary >4-char piece must disqualify the whole mask,
        // not vanish through the inner join leaving the remnant scored
        .filter(expr("array_max(transform(pieces, p -> length(p)))") <= 4)
        .select(col("tok"), col("mask"),
          size(col("pieces")).cast("long").as("n_pieces"),
          array_join(col("pieces"), "|").as("seg"),
          explode(col("pieces")).as("piece"))
      val scored = seg.join(broadcast(freq), "piece")
        .groupBy("tok", "mask", "n_pieces", "seg")
        .agg(sum("f").as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        .orderBy(col("n_pieces"), col("score").desc, col("mask"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("tok", "n_pieces", "seg", "score")
        .orderBy("tok")
    },

    // Unigram-LM tokenizer EM (SentencePiece's estimator, Kudo 2018 —
    // the probabilistic alternative to q120's greedy BPE): seed every
    // 1–4-char substring of the vocabulary as a piece with frequency-
    // proportional probability, VITERBI-segment each word under those
    // probabilities (the E-step), then re-estimate piece probabilities
    // from the corpus-frequency-weighted segmentations (the M-step) and
    // emit the top pieces. The DP unrolls the max word length (8) as
    // fixed rounds — each round is one equi-join of the open-position
    // frontier against the piece table plus a per-word argmax — so both
    // engines run the IDENTICAL fixed-depth recursion and the result is
    // exact, not a convergence approximation. Everything is vocabulary-
    // bounded (31 distinct words here; Zipf-small generally): corpus
    // size only enters through the one tf aggregate, the q191/q198
    // discipline. Per-step 10 dp rounds keep the argmax stable across
    // ln() ulp differences.
    QueryDef.sql(
      "q252_unigram_lm_em", {
        val rounds = (1 to 8).map { j =>
          s"""r$j AS (
             |  SELECT word, n, pos, score, path FROM (
             |    SELECT p.word, p.n, $j AS pos,
             |           round(p.score + lp.logp, 10) AS score,
             |           CASE WHEN p.path = '' THEN lp.piece
             |                ELSE p.path || '|' || lp.piece END AS path,
             |           row_number() OVER (PARTITION BY p.word
             |             ORDER BY round(p.score + lp.logp, 10) DESC,
             |                      CASE WHEN p.path = '' THEN lp.piece
             |                           ELSE p.path || '|' || lp.piece END) AS rn
             |    FROM d${j - 1} p JOIN lp
             |      ON lp.piece = substr(p.word, p.pos + 1, $j - p.pos)
             |    WHERE p.pos >= $j - 4 AND p.pos < $j AND len(p.word) >= $j)
             |  WHERE rn = 1),
             |d$j AS (SELECT * FROM d${j - 1} UNION ALL SELECT * FROM r$j)""".stripMargin
        }.mkString(",\n")
        s"""WITH tf AS (
           |  SELECT w AS word, CAST(count(*) AS BIGINT) AS n
           |  FROM (SELECT unnest(string_split(text, ' ')) AS w
           |        FROM documents WHERE text IS NOT NULL)
           |  GROUP BY w),
           |sub AS (
           |  SELECT substr(word, i, l) AS piece, sum(n) AS freq
           |  FROM tf,
           |       unnest(generate_series(1, len(word))) AS t1(i),
           |       unnest(generate_series(1, 4)) AS t2(l)
           |  WHERE i + l - 1 <= len(word)
           |  GROUP BY 1),
           |tot AS (SELECT sum(freq) AS z FROM sub),
           |lp AS (SELECT piece, round(ln(freq / z), 10) AS logp FROM sub, tot),
           |d0 AS (SELECT word, n, 0 AS pos, CAST(0.0 AS DOUBLE) AS score,
           |              '' AS path FROM tf),
           |$rounds,
           |best AS (SELECT word, n, path FROM d8 WHERE pos = len(word)),
           |m AS (SELECT piece, sum(n) AS cnt
           |      FROM (SELECT n, unnest(string_split(path, '|')) AS piece
           |            FROM best)
           |      GROUP BY piece),
           |mz AS (SELECT sum(cnt) AS z FROM m)
           |SELECT piece, CAST(cnt AS BIGINT) AS cnt, round(cnt / z, 6) AS prob
           |FROM m, mz
           |ORDER BY cnt DESC, piece LIMIT 20""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tf = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // seeds, DP base, and M-step weights
      val sub = tf
        .select(col("word"), col("n"), explode(sequence(lit(1),
          length(col("word")))).as("i"))
        .select(col("word"), col("n"), col("i"),
          explode(sequence(lit(1), lit(4))).as("l"))
        .filter(col("i") + col("l") - 1 <= length(col("word")))
        .select(expr("substr(word, i, l)").as("piece"), col("n"))
        .groupBy("piece").agg(sum("n").as("freq"))
      val tot = sub.agg(sum("freq").as("z"))
      val lp = sub.crossJoin(broadcast(tot))
        .select(col("piece"), round(log(col("freq") / col("z")), 10).as("logp"))
        .localCheckpoint(true) // joined 8× by the DP rounds
      var dp = tf.select(col("word"), col("n"), lit(0).as("pos"),
        lit(0.0).as("score"), lit("").as("path"))
      for (j <- 1 to 8) {
        val newPath = when(col("path") === "", col("piece"))
          .otherwise(concat(col("path"), lit("|"), col("piece")))
        val w = Window.partitionBy("word")
          .orderBy(col("score").desc, col("path"))
        val rj = dp
          .filter(col("pos") >= j - 4 && col("pos") < j &&
            length(col("word")) >= j)
          .join(lp, col("piece") === expr(s"substr(word, pos + 1, $j - pos)"))
          .select(col("word"), col("n"), lit(j).as("pos"),
            round(col("score") + col("logp"), 10).as("score"),
            newPath.as("path"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
        // checkpoint each round: dp_j = dp_{j-1} ∪ f(dp_{j-1}) references
        // the previous frame TWICE, so without truncation the plan doubles
        // per round — 2^8 recomputes of round 1 by round 8 (measured 138 s
        // at sf0.1; ~1 s with the checkpoint). The frame is ≤ 31·(j+1)
        // rows — materializing it is free.
        dp = dp.unionByName(rj).localCheckpoint(true)
      }
      val best = dp.filter(col("pos") === length(col("word")))
        .select(col("n"), col("path"))
      val m = best
        .select(col("n"), explode(split(col("path"), "\\|")).as("piece"))
        .groupBy("piece").agg(sum("n").as("cnt"))
      val mz = m.agg(sum("cnt").as("z"))
      m.crossJoin(broadcast(mz))
        .select(col("piece"), col("cnt"),
          round(col("cnt") / col("z"), 6).as("prob"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(20)
    }
  )
}
