package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics ranking and scoring operators over `documents`
  * (SURVEY.md §7.4 text analysis, extended): TF-IDF term extraction, BM25
  * retrieval scoring, and a unigram language-model log-probability — the
  * CCNet-style "perplexity" quality signal. All exact-arithmetic where the
  * engines can agree (integer counts; one final rounded double), so every
  * query is oracle-checked.
  *
  * Scale shape shared by all three: tokenize in a narrow pass, aggregate
  * counts (map-side partial), join tokens against the corpus-wide term
  * statistics on the term key. The term-stats side is Zipf-small relative
  * to the corpus; at 100 TB the join is a plain shuffle equi-join on the
  * word — never a broadcast of the corpus, never quadratic.
  */
object RetrievalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Top-3 TF-IDF terms per document (docs 0-49 to bound output): the
    // canonical keyword extractor. Ranking uses the ROUNDED score in both
    // engines so float ties break identically (then by word).
    QueryDef.sql(
      "q85_tfidf",
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |              FROM documents),
        |     tf AS (SELECT doc_id, word, count(*) AS tf FROM toks
        |            WHERE word <> '' GROUP BY doc_id, word),
        |     df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks
        |            WHERE word <> '' GROUP BY word),
        |     n AS (SELECT count(*) AS n FROM documents),
        |     scored AS (SELECT tf.doc_id, tf.word,
        |                       round(tf.tf * ln(n.n::DOUBLE / df.df), 4) AS tfidf
        |                FROM tf JOIN df USING (word) CROSS JOIN n
        |                WHERE tf.doc_id < 50),
        |     ranked AS (SELECT doc_id, word, tfidf,
        |                       row_number() OVER (PARTITION BY doc_id
        |                                          ORDER BY tfidf DESC, word) AS rn
        |                FROM scored)
        |SELECT doc_id, rn AS rank, word, tfidf
        |FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      // ONE tokenize pass (q119's discipline): the per-(doc, word) tf table
      // is the universal object — df is its per-word row count and the
      // query slice a filter — so the corpus explode runs exactly once and
      // everything downstream reads the checkpointed Zipf-small frame.
      val tfAll = docs.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val tf = tfAll.filter(col("doc_id") < 50)
      val df = tfAll.groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(df, "word").crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 4)
            .as("tfidf"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "word", "tfidf")
        .orderBy("doc_id", "rank")
    },

    // BM25 (k1=1.2, b=0.75) of a fixed term query against the corpus —
    // the retrieval scorer a contamination/attribution pipeline runs at
    // scale. Per-term contributions sum per doc; top-20 by rounded score.
    QueryDef.sql(
      "q86_bm25",
      """WITH docs AS (SELECT doc_id,
        |                     len(list_filter(string_split(lower(text), ' '),
        |                                     w -> w <> '')) AS dl
        |              FROM documents),
        |     toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |              FROM documents),
        |     tf AS (SELECT doc_id, word, count(*) AS tf FROM toks
        |            WHERE word IN ('fast', 'merge', 'window') GROUP BY doc_id, word),
        |     df AS (SELECT word, count(DISTINCT doc_id) AS df FROM toks
        |            WHERE word IN ('fast', 'merge', 'window') GROUP BY word),
        |     stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM docs),
        |     contrib AS (SELECT tf.doc_id,
        |                        ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1) *
        |                        tf.tf * 2.2 /
        |                        (tf.tf + 1.2 * (0.25 + 0.75 * docs.dl / stats.avgdl))
        |                          AS c
        |                 FROM tf JOIN df USING (word)
        |                 JOIN docs ON tf.doc_id = docs.doc_id
        |                 CROSS JOIN stats),
        |     scored AS (SELECT doc_id, round(sum(c), 4) AS bm25 FROM contrib
        |                GROUP BY doc_id)
        |SELECT doc_id, bm25 FROM scored
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      val terms = Seq("fast", "merge", "window")
      val raw = t(s, d, "documents")
      val words = split(lower(col("text")), " ")
      // (doc_id, dl) feeds the corpus stats AND the score join — checkpoint
      // so the per-doc tokenize for lengths runs once, not per consumer
      val docs = raw.select(col("doc_id"),
          size(filter(words, w => w =!= "")).as("dl"))
        .localCheckpoint(true)
      val toks = raw.select(col("doc_id"),
          explode(words).as("word"))
        .filter(col("word").isin(terms: _*))
      // one tokenize pass for the term side too: df = per-word row count of
      // the (doc, word) tf table (one row per matching doc), never a second
      // corpus explode
      val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      val c = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
        col("tf") * 2.2 /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      tf.join(broadcast(df), "word")
        .join(docs, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), c.as("c"))
        .groupBy("doc_id").agg(round(sum("c"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    },

    // Unigram LM mean log-probability per document — the cheap stand-in
    // for the KenLM perplexity filter in CCNet-style curation: documents
    // whose tokens are corpus-typical score high, gibberish scores low.
    // Output bounded to docs 0-49.
    QueryDef.sql(
      "q87_unigram_logprob",
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |              FROM documents),
        |     clean AS (SELECT doc_id, word FROM toks WHERE word <> ''),
        |     vocab AS (SELECT word, count(*) AS cnt FROM clean GROUP BY word),
        |     total AS (SELECT count(*) AS total FROM clean)
        |SELECT c.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(avg(ln(vocab.cnt::DOUBLE / total.total)), 4) AS mean_logprob
        |FROM clean c JOIN vocab USING (word) CROSS JOIN total
        |WHERE c.doc_id < 50
        |GROUP BY c.doc_id
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      // q119's single-pass discipline: the exploded corpus feeds the vocab
      // AND the scored slice — checkpoint it; the token total is the sum of
      // the Zipf-small vocab counts, never a corpus re-scan
      val clean = t(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .localCheckpoint(true)
      val vocab = clean.groupBy("word").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val total = vocab.agg(sum("cnt").as("total"))
      clean.filter(col("doc_id") < 50)
        .join(vocab, "word")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log(col("cnt").cast("double") / col("total"))), 4)
            .as("mean_logprob"))
        .orderBy("doc_id")
    },

    // Interpolated Kneser-Ney bigram LM — the standard smoothing behind
    // KenLM-style perplexity filters (q87's unigram stand-in upgraded to
    // the real thing): P(v|u) = max(c(u,v)-D,0)/c(u·) +
    // D·N1+(u·)/c(u·) · N1+(·v)/|bigram types|, D = 0.75. The
    // continuation count N1+(·v) ("how many contexts precede v") is what
    // distinguishes KN from plain absolute discounting — "francisco" is
    // frequent but only ever follows "san", so its continuation mass is
    // tiny. Scored as mean ln P over each document's bigrams (docs 0-49,
    // the q87 output bound). Determinism: every P term is a ratio of
    // exact integer counts evaluated in double with the identical operand
    // tree in both engines; ln rounds at 4 dp through the avg (the q87
    // precedent). Scale shape: ONE tokenize/bigram explode feeds the
    // count model AND the scored slice (checkpointed, the q119/q87
    // discipline); the model tables are vocabulary-bounded (Zipf) — the
    // unigram-context and continuation frames broadcast, the bigram table
    // joins the scored slice on an equi-key; nothing corpus-sized
    // shuffles twice.
    QueryDef.sql(
      "q279_kneser_ney",
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |              FROM documents),
        |     big AS (SELECT doc_id, w[i] AS u, w[i+1] AS v
        |             FROM toks,
        |                  unnest(generate_series(1, len(w) - 1)) AS t(i)
        |             WHERE w[i] <> '' AND w[i+1] <> ''),
        |     bc AS (SELECT u, v, count(*) AS c FROM big GROUP BY u, v),
        |     cu AS (SELECT u, CAST(sum(c) AS BIGINT) AS cu,
        |                   count(*) AS fol
        |            FROM bc GROUP BY u),
        |     cont AS (SELECT v, count(*) AS pre FROM bc GROUP BY v),
        |     tot AS (SELECT count(*) AS bt FROM bc),
        |     p AS (SELECT b.doc_id,
        |                  ln(greatest(c - 0.75, 0) / cu +
        |                     (0.75 * fol / cu) * (pre / CAST(bt AS DOUBLE)))
        |                    AS lp
        |           FROM big b JOIN bc USING (u, v) JOIN cu USING (u)
        |                JOIN cont USING (v) CROSS JOIN tot
        |           WHERE b.doc_id < 50)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(lp), 4) AS mean_kn_logprob
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val big = t(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"),
          posexplode(expr("slice(w, 1, greatest(size(w) - 1, 0))"))
            .as(Seq("i", "u")),
          col("w"))
        .select(col("doc_id"), col("u"),
          element_at(col("w"), col("i") + 2).as("v"))
        .filter(col("u") =!= "" && col("v") =!= "")
        .localCheckpoint(true)
      val bc = big.groupBy("u", "v").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val cu = bc.groupBy("u")
        .agg(sum("c").as("cu"), count(lit(1)).as("fol"))
      val cont = bc.groupBy("v").agg(count(lit(1)).as("pre"))
      val tot = bc.agg(count(lit(1)).as("bt"))
      val p = greatest(col("c") - 0.75, lit(0)) / col("cu") +
        (lit(0.75) * col("fol") / col("cu")) *
          (col("pre") / col("bt").cast("double"))
      big.filter(col("doc_id") < 50)
        .join(bc, Seq("u", "v"))
        .join(broadcast(cu), Seq("u"))
        .join(broadcast(cont), Seq("v"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), log(p).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg("lp"), 4).as("mean_kn_logprob"))
        .orderBy("doc_id")
    },

    // RAG-style document chunking: fixed 32-token windows with stride 24
    // (8-token overlap), the standard retrieval-corpus preparation step.
    // Pure per-document generate+slice — embarrassingly parallel, output
    // row count is tokens/stride (no shuffle at all until the final sort).
    QueryDef.sql(
      "q96_chunking",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |              FROM documents),
        |     c AS (SELECT doc_id, i AS chunk_idx,
        |                  list_slice(w, i * 24 + 1, i * 24 + 32) AS cw
        |           FROM toks,
        |                unnest(generate_series(0, (len(w) - 1) // 24)) AS t(i))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       CAST(len(cw) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(cw, ' ') AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(0L),
            floor((size(col("w")) - 1) / lit(24.0)).cast("long")))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          slice(col("w"), (col("chunk_idx") * 24 + 1).cast("int"), lit(32))
            .as("cw"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("cw")).cast("long").as("n_chunk_tokens"),
          array_join(col("cw"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // DSIR-style data selection (Xie et al., "Data Selection for Language
    // Models via Importance Resampling", NeurIPS 2023): score every raw-pool
    // document by its mean per-token log-likelihood ratio between a target-
    // domain unigram LM (here source 'src0') and the raw-pool LM, both
    // add-one smoothed over the shared vocabulary. High scorers read like
    // the target domain — the importance weight that drives the resampling
    // step (q103's machinery). Same scale shape as q87: narrow tokenize,
    // Zipf-small LM tables joined on the word, counts exact, one rounded
    // double at the end.
    QueryDef.sql(
      "q119_dsir_weights",
      """WITH toks AS (SELECT doc_id, source,
        |                     unnest(string_split(lower(text), ' ')) AS word
        |              FROM documents),
        |     clean AS (SELECT doc_id, source, word FROM toks WHERE word <> ''),
        |     tgt AS (SELECT word, count(*) AS tc FROM clean
        |             WHERE source = 'src0' GROUP BY word),
        |     rawp AS (SELECT word, count(*) AS rc FROM clean
        |              WHERE source <> 'src0' GROUP BY word),
        |     v AS (SELECT count(DISTINCT word) AS vsz FROM clean),
        |     tn AS (SELECT count(*) AS n FROM clean WHERE source = 'src0'),
        |     rn AS (SELECT count(*) AS n FROM clean WHERE source <> 'src0')
        |SELECT c.doc_id, count(*) AS n_tokens,
        |       round(avg(ln(
        |         ((coalesce(tgt.tc, 0) + 1) * (rn.n + v.vsz))::DOUBLE /
        |         ((coalesce(rawp.rc, 0) + 1) * (tn.n + v.vsz)))), 4)
        |         + 0.0 AS mean_llr
        |FROM clean c
        |LEFT JOIN tgt USING (word) LEFT JOIN rawp USING (word)
        |CROSS JOIN v CROSS JOIN tn CROSS JOIN rn
        |WHERE c.source <> 'src0' AND c.doc_id < 100
        |GROUP BY c.doc_id
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      // ONE tokenize pass over the corpus, materialized: the exploded token
      // frame feeds both the LM aggregation and the final per-document join.
      // Without the checkpoint every downstream consumer re-runs the
      // scan+lower+split+explode — at 100 TB that is 5 redundant corpus
      // scans; with it, exactly one.
      val clean = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .localCheckpoint(true)
      // Both LMs in ONE groupBy via conditional counts — tc/rc are exact
      // longs (count(when(...)) yields 0, never null, for absent words), so
      // the smoothing arithmetic matches the oracle's coalesce(..., 0).
      val lm = clean.groupBy("word").agg(
          count(when(col("source") === "src0", 1)).as("tc"),
          count(when(col("source") =!= "src0", 1)).as("rc"))
        .localCheckpoint(true)
      // vsz/tn/rn fall out of the Zipf-small LM table — no corpus re-scan:
      // every distinct word is one lm row, and the conditional counts sum
      // to the per-side token totals.
      val scalars = lm.agg(count(lit(1)).as("vsz"),
        sum("tc").as("tn"), sum("rc").as("rn"))
      // smoothed ratio rearranged to one log of an exact integer ratio:
      // ((tc+1)(rn+V)) / ((rc+1)(tn+V)) — products of exact longs, so both
      // engines log the identical rational
      clean.filter(col("source") =!= "src0" && col("doc_id") < 100)
        .join(lm, Seq("word"))
        .crossJoin(broadcast(scalars))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          // + 0.0 canonicalizes IEEE -0.0 (a tiny negative mean rounds to
          // negative zero in one engine and positive in the other)
          (round(avg(log(
            ((col("tc") + 1) * (col("rn") + col("vsz"))).cast("double") /
            ((col("rc") + 1) * (col("tn") + col("vsz"))).cast("double"))), 4)
            + 0.0).as("mean_llr"))
        .orderBy("doc_id")
    },

    // Distributed BPE tokenizer training (graft.ml.Bpe): 8 merge rounds
    // over the corpus word-frequency vocab. The merge table IS the model —
    // per round one pair-count aggregation over the (Zipf-small) vocab and
    // a one-row argmax to the driver; the corpus itself is read exactly
    // once. EXACT oracle (upgraded from rows-only): the round count is
    // fixed (8) and every step is engine-mirrorable — the word-frequency
    // vocab, the adjacent-pair count over the U+0001-joined symbol string,
    // the (count DESC, left, right) argmax (byte-order string comparison
    // in both engines on this ASCII corpus), and the token-level merge
    // fold (Bpe.mergeFold's exact semantics as a list_reduce: append r
    // separator-less when the accumulator's last COMPLETE symbol is l —
    // whole-token matching, so a symbol merely ending in l never merges)
    // — so DuckDB unrolls the same eight rounds as generated CTEs. Exact
    // parity with a single-node reference implementation stays pinned by
    // BpeSpec, including the suffix-collision case a string-level replace
    // gets wrong in BOTH engines at once.
    QueryDef.sql(
      "q120_bpe_merges",
      {
        val rounds = (1 to 8).map { i =>
          val prev = s"s${i - 1}"
          s"""p$i AS (
             |  SELECT (pp).l AS l, (pp).r AS r, CAST(sum(freq) AS BIGINT) AS cnt
             |  FROM (SELECT freq,
             |               unnest(list_transform(generate_series(1, len(sp) - 1),
             |                      i -> struct_pack(l := sp[i], r := sp[i+1]))) AS pp
             |        FROM (SELECT freq, string_split(seq, chr(1)) AS sp FROM $prev))
             |  GROUP BY 1, 2),
             |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
             |s$i AS (SELECT word, freq,
             |               list_reduce(string_split(s.seq, chr(1)),
             |                 (acc, x) -> CASE WHEN (acc = b.l OR
             |                                        ends_with(acc, chr(1) || b.l))
             |                                   AND x = b.r
             |                                  THEN acc || b.r
             |                                  ELSE acc || chr(1) || x END) AS seq
             |        FROM $prev s CROSS JOIN b$i b)""".stripMargin
        }.mkString(",\n")
        val out = (1 to 8).map(i =>
          s"SELECT ${i - 1} AS \"round\", l AS \"left\", r AS \"right\", cnt AS \"count\" FROM b$i")
          .mkString("\nUNION ALL ")
        s"""WITH v AS (
           |  SELECT word, CAST(count(*) AS BIGINT) AS freq
           |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
           |        FROM documents)
           |  WHERE word <> '' GROUP BY word),
           |s0 AS (
           |  SELECT word, freq,
           |         array_to_string(list_transform(generate_series(1, length(word)),
           |                         i -> substring(word, i, 1)), chr(1)) AS seq
           |  FROM v),
           |$rounds
           |$out
           |ORDER BY "round"""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      val vocab = graft.ml.Bpe.wordVocab(t(s, d, "documents"), "text")
      graft.ml.Bpe.train(vocab, rounds = 8)
        .toDF()
        .select(col("round"), col("left"), col("right"), col("count"))
        .orderBy("round")
    }
  )
}
