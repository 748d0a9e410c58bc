package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (SURVEY.md §7.4): language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions — one narrow pass per document, shuffle only for the final
  * summaries — and every formula is mirrored exactly in the DuckDB oracle
  * (integer counts + IEEE double ratios, so results match bit-for-bit).
  *
  * Note: the synthetic corpus draws every document from one shared English
  * vocabulary regardless of its `lang` tag, so the language-ID heuristic is
  * validated as a deterministic formula (oracle), not against the tag.
  */
object TextQueries {

  /** Marker-stopword sets per language (the n-gram-heuristic shape real
    * langid uses; tiny on purpose). */
  private val markers: Seq[(String, String)] = Seq(
    "en" -> "(the|a|of|and)",
    "de" -> "(der|und|das|die)",
    "fr" -> "(le|et|les|des)",
    "es" -> "(el|y|los|las)")

  private def score(pat: String): Column =
    regexp_count(col("text"), lit("\\b" + pat + "\\b"))

  val defs: Seq[QueryDef] = Seq(

    // Language ID: marker-word scores + CJK-codepoint check, deterministic
    // priority argmax.
    QueryDef.sql(
      "q60_lang_id",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(the|a|of|and)\b'))  AS s_en,
        |  len(regexp_extract_all(text, '\b(der|und|das|die)\b')) AS s_de,
        |  len(regexp_extract_all(text, '\b(le|et|les|des)\b'))  AS s_fr,
        |  len(regexp_extract_all(text, '\b(el|y|los|las)\b'))   AS s_es,
        |  CASE
        |    WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
        |    WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) = 0
        |     AND len(regexp_extract_all(text, '\b(der|und|das|die)\b')) = 0
        |     AND len(regexp_extract_all(text, '\b(le|et|les|des)\b')) = 0
        |     AND len(regexp_extract_all(text, '\b(el|y|los|las)\b')) = 0 THEN 'unknown'
        |    WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(der|und|das|die)\b'))
        |     AND len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(le|et|les|des)\b'))
        |     AND len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'en'
        |    WHEN len(regexp_extract_all(text, '\b(der|und|das|die)\b')) >= len(regexp_extract_all(text, '\b(le|et|les|des)\b'))
        |     AND len(regexp_extract_all(text, '\b(der|und|das|die)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'de'
        |    WHEN len(regexp_extract_all(text, '\b(le|et|les|des)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'fr'
        |    ELSE 'es' END AS predicted
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val Seq(en, de, fr, es) = markers.map { case (_, p) => score(p) }
      val zh = regexp_count(col("text"), lit("[一-鿿]"))
      t(s, d, "documents").select(
        col("doc_id"),
        en.as("s_en"), de.as("s_de"), fr.as("s_fr"), es.as("s_es"),
        when(zh > 0, "zh")
          .when(en === 0 && de === 0 && fr === 0 && es === 0, "unknown")
          .when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es").as("predicted"))
        .orderBy("doc_id")
    },

    // Quality scoring: length/punctuation/stopword ratios composed into one
    // [0,1] score — the pre-training filter shape.
    QueryDef.sql(
      "q61_quality_score",
      """SELECT doc_id,
        |  length(text) AS n_chars_m,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_words,
        |  round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE
        |        / length(text), 6) AS punct_ratio,
        |  round(len(regexp_extract_all(text, '\b(the|a|of|and)\b'))::DOUBLE
        |        / len(regexp_extract_all(text, '[a-z]+')), 6) AS stopword_ratio,
        |  round(0.5 * least(len(regexp_extract_all(text, '[a-z]+')) / 120.0, 1.0)
        |      + 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / length(text))
        |      + 0.2 * least(4 * len(regexp_extract_all(text, '\b(the|a|of|and)\b'))::DOUBLE
        |                    / len(regexp_extract_all(text, '[a-z]+')), 1.0), 6) AS quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nWords = regexp_count(col("text"), lit("[a-z]+"))
      val nPunct = regexp_count(col("text"), lit("[^a-z0-9 ]"))
      val nStop = regexp_count(col("text"), lit("\\b(the|a|of|and)\\b"))
      val nChars = length(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        nChars.as("n_chars_m"),
        nWords.as("n_words"),
        round(nPunct.cast("double") / nChars, 6).as("punct_ratio"),
        round(nStop.cast("double") / nWords, 6).as("stopword_ratio"),
        round(lit(0.5) * least(nWords / 120.0, lit(1.0))
          + lit(0.3) * (lit(1.0) - nPunct.cast("double") / nChars)
          + lit(0.2) * least(lit(4) * nStop.cast("double") / nWords, lit(1.0)), 6)
          .as("quality"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (alpha runs / digit runs / single punctuation), summed per source —
    // exact integer aggregation.
    QueryDef.sql(
      "q62_token_count",
      """SELECT source,
        |  count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(regexp_count(col("text"), lit("\\S+"))).as("ws_tokens"),
          sum(regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")))
            .as("bpe_tokens"),
          sum(length(col("text"))).as("total_chars"))
        .orderBy("source")
    },

    // Document fingerprinting: 32-bit-masked polynomial rolling hash over the
    // character stream — overflow-free in ANSI mode, identical fold in both
    // engines (DuckDB list_reduce is a left fold with the first element as
    // init, hence the prepended seed).
    QueryDef.sql(
      "q63_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      list_transform(generate_series(1, length(text)),
        |                     i -> ascii(substring(text, i, 1))::BIGINT)),
        |    (acc, c) -> (acc * 31 + c) & 4294967295) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val chars = transform(
        sequence(lit(1), length(col("text"))),
        i => ascii(col("text").substr(i, lit(1))).cast("long"))
      t(s, d, "documents").select(
        col("doc_id"),
        aggregate(chars, lit(7L),
          (acc, c) => (acc * 31 + c).bitwiseAND(lit(4294967295L))).as("fp"))
        .orderBy("doc_id")
    },

    // PII redaction — the scrub pass every public-web training corpus
    // runs before release. The synthetic corpus carries no PII, so it is
    // INJECTED deterministically (every 5th doc gains an email + a phone
    // number — the same make-it-non-vacuous discipline as q90/q128), then
    // scrubbed with the classic pattern pass: emails and phone numbers
    // collapse to typed placeholders. Patterns stay in the Java-regex ∩
    // RE2 common subset (character classes, +, {n} — no lookaround), so
    // both engines match identically; the md5 of the redacted text pins
    // the full output byte-for-byte. 100 TB shape: pure narrow per-row
    // regex work, zero shuffle before the presentation sort, and the scan
    // reads only (doc_id, text).
    QueryDef.sql(
      "q151_pii_redact",
      """WITH injected AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0
        |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
        |                   || '@example.com or call 555-'
        |                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              ELSE text END AS text
        |  FROM documents),
        |scrubbed AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_emails,
        |         len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
        |         regexp_replace(regexp_replace(text,
        |           '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |           '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM injected)
        |SELECT doc_id, n_emails, n_phones,
        |       length(redacted) AS n_chars_redacted,
        |       md5(redacted) AS redacted_md5
        |FROM scrubbed
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val injected = t(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com or call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")).as("text"))
      val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phoneRe = "555-[0-9]{4}"
      injected.select(col("doc_id"),
          regexp_count(col("text"), lit(emailRe)).as("n_emails"),
          regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
          regexp_replace(regexp_replace(col("text"),
            emailRe, "<EMAIL>"), phoneRe, "<PHONE>").as("redacted"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).as("n_chars_redacted"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")
    },

    // Gopher repetition rules (Rae et al. 2021 §A1.1 — the filter suite
    // every web-scale corpus pipeline applies): per document, the token
    // coverage of the single most frequent 2-/3-/4-gram and the fraction
    // of tokens inside ANY duplicated 5-gram (overlaps counted once — an
    // exact merged-interval sweep, the q123 coverage pattern, windowed per
    // doc so WindowSweepSpec's no-global-sort lint holds). Pass flags use
    // Gopher's published thresholds (0.20 / 0.18 / 0.16 / 0.15) expressed
    // in INTEGER arithmetic (mc·n·100 ≤ thr·100·n_tokens), so both
    // engines agree exactly with no float rounding at the boundary.
    // Scale shape: one tokenize pass feeds a single posexploded n-gram
    // frame (n = 2, 3, 4 tagged in one explode → one shuffle on
    // (doc, n, gram)) plus the 5-gram interval frame; everything
    // partitions by doc_id — no corpus-wide vocabulary structure.
    QueryDef.sql(
      "q159_gopher_rep",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |              FROM documents),
        |base AS (SELECT doc_id, len(w) AS n_tokens, w FROM toks),
        |gi AS (SELECT doc_id, n, array_to_string(list_slice(w, i, i + n - 1), ' ') AS g
        |       FROM base, unnest([2, 3, 4]) AS ns(n),
        |            unnest(generate_series(1, len(w) - n + 1)) AS t(i)
        |       WHERE len(w) >= n),
        |gc AS (SELECT doc_id, n, g, count(*) AS c FROM gi GROUP BY doc_id, n, g),
        |top AS (SELECT doc_id, n, max(c) AS mc FROM gc GROUP BY doc_id, n),
        |cov AS (SELECT doc_id,
        |               max(CASE WHEN n = 2 THEN mc END) AS mc2,
        |               max(CASE WHEN n = 3 THEN mc END) AS mc3,
        |               max(CASE WHEN n = 4 THEN mc END) AS mc4
        |        FROM top GROUP BY doc_id),
        |g5 AS (SELECT doc_id, i AS lo, i + 4 AS hi,
        |              array_to_string(list_slice(w, i, i + 4), ' ') AS g
        |       FROM base, unnest(generate_series(1, len(w) - 4)) AS t(i)
        |       WHERE len(w) >= 5),
        |dup AS (SELECT doc_id, g FROM g5 GROUP BY doc_id, g HAVING count(*) >= 2),
        |ivl AS (SELECT g5.doc_id, g5.lo, g5.hi FROM g5 JOIN dup
        |        ON g5.doc_id = dup.doc_id AND g5.g = dup.g),
        |sweep AS (SELECT doc_id, lo, hi,
        |                 coalesce(max(hi) OVER (PARTITION BY doc_id
        |                   ORDER BY lo, hi
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                   0) AS pm
        |          FROM ivl),
        |d5 AS (SELECT doc_id,
        |              sum(greatest(hi - greatest(pm, lo - 1), 0)) AS dup5
        |       FROM sweep GROUP BY doc_id)
        |SELECT b.doc_id,
        |       CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |       round(coalesce(c.mc2, 0) * 2.0 / b.n_tokens, 6) AS top2_cov,
        |       round(coalesce(c.mc3, 0) * 3.0 / b.n_tokens, 6) AS top3_cov,
        |       round(coalesce(c.mc4, 0) * 4.0 / b.n_tokens, 6) AS top4_cov,
        |       round(coalesce(d.dup5, 0) * 1.0 / b.n_tokens, 6) AS dup5_cov,
        |       (coalesce(c.mc2, 0) * 200 <= 20 * b.n_tokens AND
        |        coalesce(c.mc3, 0) * 300 <= 18 * b.n_tokens AND
        |        coalesce(c.mc4, 0) * 400 <= 16 * b.n_tokens AND
        |        coalesce(d.dup5, 0) * 100 <= 15 * b.n_tokens) AS gopher_ok
        |FROM base b
        |LEFT JOIN cov c ON b.doc_id = c.doc_id
        |LEFT JOIN d5 d ON b.doc_id = d.doc_id
        |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .localCheckpoint(true) // feeds the base counts, the n-gram frame, and the 5-gram frame
      val w = col("w")
      val base = docs.select(col("doc_id"), size(w).cast("long").as("n_tokens"))
      // one explode for all three n: (n, gram) structs flattened together
      def grams(n: Int) = when(size(w) >= n,
        transform(sequence(lit(1), size(w) - n + 1),
          i => struct(lit(n).as("n"),
            concat_ws(" ", slice(w, i, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
      val gi = docs.select(col("doc_id"),
          explode(flatten(array(grams(2), grams(3), grams(4)))).as("p"))
        .select(col("doc_id"), col("p.n").as("n"), col("p.g").as("g"))
      val top = gi.groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n").agg(max("c").as("mc"))
      val cov = top.groupBy("doc_id")
        .agg(max(when(col("n") === 2, col("mc"))).as("mc2"),
          max(when(col("n") === 3, col("mc"))).as("mc3"),
          max(when(col("n") === 4, col("mc"))).as("mc4"))
      // duplicated-5-gram token coverage: positions of grams seen >= 2x,
      // merged-interval length via the per-doc running-max sweep
      val g5 = docs.filter(size(w) >= 5)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(w) - 4),
          i => struct(i.as("lo"), (i + 4).as("hi"),
            concat_ws(" ", slice(w, i, lit(5))).as("g")))).as("p"))
        .select(col("doc_id"), col("p.lo").as("lo"), col("p.hi").as("hi"),
          col("p.g").as("g"))
      val wg = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id", "g")
      val wsweep = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("lo", "hi")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val d5 = g5.withColumn("cnt", count(lit(1)).over(wg))
        .filter(col("cnt") >= 2)
        .withColumn("pm", coalesce(max("hi").over(wsweep), lit(0)))
        .groupBy("doc_id")
        .agg(sum(greatest(col("hi") - greatest(col("pm"), col("lo") - 1),
          lit(0))).as("dup5"))
      base.join(cov, Seq("doc_id"), "left")
        .join(d5, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          round(coalesce(col("mc2"), lit(0L)) * 2.0 / col("n_tokens"), 6)
            .as("top2_cov"),
          round(coalesce(col("mc3"), lit(0L)) * 3.0 / col("n_tokens"), 6)
            .as("top3_cov"),
          round(coalesce(col("mc4"), lit(0L)) * 4.0 / col("n_tokens"), 6)
            .as("top4_cov"),
          round(coalesce(col("dup5"), lit(0L)) * 1.0 / col("n_tokens"), 6)
            .as("dup5_cov"),
          (coalesce(col("mc2"), lit(0L)) * 200 <= lit(20) * col("n_tokens") &&
            coalesce(col("mc3"), lit(0L)) * 300 <= lit(18) * col("n_tokens") &&
            coalesce(col("mc4"), lit(0L)) * 400 <= lit(16) * col("n_tokens") &&
            coalesce(col("dup5"), lit(0L)) * 100 <= lit(15) * col("n_tokens"))
            .as("gopher_ok"))
        .orderBy("doc_id")
    },

    // Language-ID confusion matrix: q60's heuristic classifier evaluated
    // against the corpus's lang labels — the per-class quality report a
    // curation run reads before trusting the classifier for routing.
    // Each (labeled, predicted) cell carries its count and its share of
    // the labeled class (row-normalized recall); the within-label share
    // windows over the ≤ |langs|² cell frame, so the second pass is
    // free. Classifier and evaluation are one scan.
    QueryDef.sql(
      "q265_lang_confusion",
      """WITH pred AS (
        |  SELECT lang AS labeled,
        |    CASE
        |      WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
        |      WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) = 0
        |       AND len(regexp_extract_all(text, '\b(der|und|das|die)\b')) = 0
        |       AND len(regexp_extract_all(text, '\b(le|et|les|des)\b')) = 0
        |       AND len(regexp_extract_all(text, '\b(el|y|los|las)\b')) = 0 THEN 'unknown'
        |      WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(der|und|das|die)\b'))
        |       AND len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(le|et|les|des)\b'))
        |       AND len(regexp_extract_all(text, '\b(the|a|of|and)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'en'
        |      WHEN len(regexp_extract_all(text, '\b(der|und|das|die)\b')) >= len(regexp_extract_all(text, '\b(le|et|les|des)\b'))
        |       AND len(regexp_extract_all(text, '\b(der|und|das|die)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'de'
        |      WHEN len(regexp_extract_all(text, '\b(le|et|les|des)\b')) >= len(regexp_extract_all(text, '\b(el|y|los|las)\b')) THEN 'fr'
        |      ELSE 'es' END AS predicted
        |  FROM documents),
        |cells AS (SELECT labeled, predicted, count(*) AS n
        |          FROM pred GROUP BY 1, 2)
        |SELECT labeled, predicted, CAST(n AS BIGINT) AS n,
        |       round(n * 1.0 / sum(n) OVER (PARTITION BY labeled), 6)
        |         AS label_share
        |FROM cells
        |ORDER BY labeled, predicted""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val Seq(en, de, fr, es) = markers.map { case (_, p) => score(p) }
      val zh = regexp_count(col("text"), lit("[一-鿿]"))
      val cells = t(s, d, "documents")
        .select(col("lang").as("labeled"),
          when(zh > 0, "zh")
            .when(en === 0 && de === 0 && fr === 0 && es === 0, "unknown")
            .when(en >= de && en >= fr && en >= es, "en")
            .when(de >= fr && de >= es, "de")
            .when(fr >= es, "fr")
            .otherwise("es").as("predicted"))
        .groupBy("labeled", "predicted")
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("label_share",
          round(col("n") * 1.0 /
            sum("n").over(Window.partitionBy("labeled")), 6))
        .orderBy("labeled", "predicted")
    },

    // Compression-ratio quality signal — the classic repetition detector
    // in web-corpus curation, run with the JDK's REAL DEFLATE codec
    // (java.util.zip) inside mapPartitions with per-partition zlib state.
    // The byte-exact deflate size is zlib-version-specific, so the gate
    // hashes the INVARIANTS any correct DEFLATE must satisfy (the q77
    // bound-oracle pattern): lossless round trip and the LZ77
    // dup-discount (a duplicated ≤32KB text's second copy codes as
    // back-references, ~len/50 bytes, against a ~len/4 margin — corpus
    // max is 577 bytes, so ~10× slack). n_raw is exact (ASCII corpus:
    // codepoints == bytes). The raw compressed sizes stay on the Dataset
    // API (CompressionQuality.stats) for real consumers and are
    // spec-pinned. Scale shape: one narrow pass, no shuffle before the
    // final sort; codec state allocated once per partition.
    QueryDef.sql(
      "q336_deflate_signal",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_raw,
        |       TRUE AS round_trip_ok, TRUE AS dup_discount_ok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      CompressionQuality.stats(t(s, d, "documents")).toDF()
        .select(col("doc_id"), col("n_raw").cast("long").as("n_raw"),
          col("round_trip_ok"), col("dup_discount_ok"))
        .orderBy("doc_id")
    }
  )
}
