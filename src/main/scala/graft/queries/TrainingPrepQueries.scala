package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators a pretraining pipeline runs after
  * curation: sequence packing (concat-and-chunk at a fixed token budget),
  * incremental dedup of a new batch against an existing corpus index, and
  * an n-gram language-model perplexity filter (the CCNet-style quality
  * screen). All three fully oracle-checked.
  */
object TrainingPrepQueries {

  /** Tokens per sequence in q126's packing — the training context length. */
  private val PackBudget = 256L

  /** q148's temperature-mix math (α = 0.5), factored out so MixSplitSpec
    * can pin it on a SKEWED source profile — the gated corpus's sources
    * are all equal-sized, which would leave the upweighting property
    * untested in situ. Per source: quota ∝ √n_docs scaled to
    * `budgetFrac`·Σn, CAPPED at the source size (the UniMax cap — on
    * skewed corpora a small source's uncapped share can exceed its own
    * size), plus the 4-hex md5 membership threshold (65535 ceiling: a
    * full-take source undersamples by ≤1/65536, deterministically in both
    * engines). Input: (source, n_docs).
    *
    * EXACT-ARITHMETIC form (round 14): the α-weight is the INTEGER square
    * root w = ⌊√n⌋ and everything downstream is BIGINT (Σw, (budget·w)
    * div Σw, (quota·65536) div n). The previous double form hit a real
    * knife edge: on a perfectly uniform corpus (20 × 250 docs) the true
    * quota is exactly 125, and Spark's naive partial-agg sum of √n landed
    * one ulp ABOVE while DuckDB's compensated sum landed one ulp BELOW —
    * floor() split them (CHECK_SF01 caught it the first round the
    * generated corpus came out exactly uniform). ⌊√n⌋ itself is
    * bit-exact in both engines for any BIGINT n: IEEE sqrt is correctly
    * rounded, so it is exact at perfect squares and >1/(3√n) away from
    * the next integer otherwise. The α = 0.5 semantics are preserved up
    * to the integer-weight discretization, which the oracle reproduces
    * verbatim. */
  def temperatureQuotas(counts: org.apache.spark.sql.DataFrame,
      budgetFrac: Double): org.apache.spark.sql.DataFrame = {
    val w = floor(sqrt(col("n_docs").cast("double"))).cast("long")
    val weighted = counts.withColumn("w", w)
    val tot = weighted.agg(
      floor(sum("n_docs") * budgetFrac).cast("long").as("budget"),
      sum(col("w")).as("denom"))
    weighted.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        least(expr("(budget * w) div denom"), col("n_docs")).as("quota"))
      .select(col("source"), col("n_docs"), col("quota"),
        format_string("%04x",
          least(expr("(quota * 65536) div n_docs"), lit(65535L))).as("thr"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Sequence packing: GPT-style pretraining concatenates each shard's
    // token stream and cuts it every `PackBudget` tokens. Per document:
    // which packed sequence its first token lands in, and how many chunk
    // boundaries it straddles (straddle count drives the "document torn
    // across sequences" loss-masking decision).
    //
    // 100 TB shape: the running total is a window partitioned by `source`
    // (the shard key) — each shard's cumsum is independent, so the window
    // parallelizes across shards and no global single-partition sort ever
    // exists. Counts are exact integers; no float discipline needed.
    QueryDef.sql(
      "q126_seq_pack",
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, source, n_tokens,
        |         coalesce(sum(n_tokens) OVER (
        |           PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM toks)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(cum_before AS BIGINT) AS cum_before,
        |       CAST(cum_before // $PackBudget AS BIGINT) AS pack_id,
        |       CAST(greatest((cum_before + n_tokens - 1) // $PackBudget
        |            - cum_before // $PackBudget, 0) AS BIGINT) AS n_splits
        |FROM cum
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long").as("n_tokens"))
        .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"),
          floor(col("cum_before") / PackBudget).as("pack_id"),
          // greatest(…, 0): a ZERO-token doc sitting exactly on a pack
          // boundary would otherwise score n_splits = -1
          greatest(floor((col("cum_before") + col("n_tokens") - 1) / PackBudget)
            - floor(col("cum_before") / PackBudget), lit(0L)).as("n_splits"))
        .orderBy("doc_id")
    },

    // Incremental dedup: the standing corpus (source='src0') is the index;
    // a new batch (noisy copies of src0 + genuinely-new src1 docs) is
    // screened against it WITHOUT rescanning or re-pairing the corpus —
    // the index is pre-aggregated to one row per content key, and only the
    // new batch flows through the join. That asymmetry is the whole point
    // at 100 TB: daily batches are small, the index is huge but key-only
    // (16-byte hash + id), and the join shuffles batch-side rows by hash
    // key with map-side-combined index keys.
    QueryDef.sql(
      "q129_incremental_dedup",
      """WITH idx AS (
        |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS k,
        |         min(doc_id) AS dup_of
        |  FROM documents WHERE source = 'src0' GROUP BY 1),
        |batch AS (
        |  SELECT doc_id + 1099511627776 AS doc_id, upper(text) || ' !!' AS text
        |  FROM documents WHERE source = 'src0'
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE source = 'src1'),
        |keyed AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS k
        |  FROM batch)
        |SELECT b.doc_id, i.dup_of,
        |       CAST(CASE WHEN i.dup_of IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        |FROM keyed b LEFT JOIN idx i ON b.k = i.k
        |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val src0 = docs.filter(col("source") === "src0")
      val idx = src0
        .select(md5(normText(col("text"))).as("k"), col("doc_id"))
        .groupBy("k").agg(min("doc_id").as("dup_of"))
      val batch = src0
        .select((col("doc_id") + 1099511627776L).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text"))
        .unionByName(docs.filter(col("source") === "src1")
          .select(col("doc_id"), col("text")))
      batch.select(col("doc_id"), md5(normText(col("text"))).as("k"))
        .join(idx, Seq("k"), "left")
        .select(col("doc_id"), col("dup_of"),
          when(col("dup_of").isNotNull, 1L).otherwise(0L).as("is_dup"))
        .orderBy("doc_id")
    },

    // Bigram character LM perplexity filter (CCNet-style quality screen):
    // fit per-language bigram conditionals on the corpus itself, score each
    // document by mean log P(c_i | c_{i-1}, lang). Scoring the training
    // corpus means every bigram was observed — MLE conditionals, no
    // smoothing term to disagree on.
    //
    // 100 TB shape: the bigram explode is narrow (one (lang,c1,c2) row per
    // character); the LM table is bounded by langs × alphabet² regardless
    // of corpus size, so both model joins are broadcasts — scoring is a
    // single map-side pass. Float discipline = q87's green precedent:
    // exact integer counts, one double ratio through ln, avg rounded 4dp.
    QueryDef.sql(
      "q130_bigram_lm",
      """WITH big AS (
        |  SELECT doc_id, lang,
        |         substring(lower(text), i, 1) AS c1,
        |         substring(lower(text), i + 1, 1) AS c2
        |  FROM documents, unnest(generate_series(1, length(text) - 1)) AS t(i)
        |  WHERE length(text) >= 2),
        |lm2 AS (SELECT lang, c1, c2, count(*) AS n2 FROM big GROUP BY 1, 2, 3),
        |lm1 AS (SELECT lang, c1, sum(n2) AS n1 FROM lm2 GROUP BY 1, 2)
        |SELECT b.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(ln(lm2.n2::DOUBLE / lm1.n1)), 4) AS mean_logprob
        |FROM big b
        |JOIN lm2 USING (lang, c1, c2)
        |JOIN lm1 USING (lang, c1)
        |WHERE b.doc_id < 50
        |GROUP BY b.doc_id
        |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      // LM fit + scoring via TextModels: the counts table is memoized
      // model state shared with q166 (one fit per session+plan, eagerly
      // checkpointed), and the scoring branch's char explode runs only
      // over the doc_id<50 slice (filter pushed to the scan) — the
      // batch-scoring shape at 100 TB
      val docs = t(s, d, "documents")
      TextModels.meanLogProb(docs, docs.filter(col("doc_id") < 50))
        .select(col("doc_id"), col("n_bigrams"),
          col("mlp").as("mean_logprob"))
        .orderBy("doc_id")
    },

    // Temperature-weighted source mixing (the UniMax / alpha-sampling
    // recipe every multi-source pretraining mix runs): per-source quota ∝
    // n_s^α (α = 0.5 — upweights small sources relative to proportional
    // sampling), total budget = half the corpus, membership decided by a
    // deterministic per-doc hash threshold — no RNG, reproducible across
    // runs and engines. The threshold compares the first 4 hex chars of
    // md5(doc_id) against printf('%04x', (quota·65536) div n_s):
    // lowercase-hex string order IS numeric order, and both engines
    // format identically, so the oracle recomputes membership exactly.
    // The α-weight is the INTEGER square root ⌊√n⌋ and the whole quota
    // pipeline is BIGINT (see temperatureQuotas — the double form hit a
    // real ulp knife edge the first time the generated corpus came out
    // exactly uniform: the true quota was exactly 125 and the two
    // engines' Σ√n summation algorithms floored to opposite sides).
    // Plan: one groupBy for counts, a 1-row broadcast for the Σ⌊√n⌋
    // denominator, one narrow scan with the threshold join — no shuffle
    // of the corpus itself, the 100 TB mix shape.
    QueryDef.sql(
      "q148_temperature_mix",
      """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |                  CAST(floor(sqrt(CAST(count(*) AS DOUBLE)))
        |                       AS BIGINT) AS w
        |           FROM documents GROUP BY source),
        |tot AS (SELECT CAST(floor(sum(n_docs) * 0.5) AS BIGINT) AS budget,
        |               CAST(sum(w) AS BIGINT) AS denom
        |        FROM s),
        |q AS (SELECT source, n_docs,
        |             least((t.budget * w) // t.denom, n_docs) AS quota,
        |             printf('%04x',
        |               least((least((t.budget * w) // t.denom, n_docs)
        |                      * 65536) // n_docs, 65535)) AS thr
        |      FROM s CROSS JOIN tot t)
        |SELECT d.source, q.n_docs, q.quota,
        |       CAST(sum(CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
        |                          < q.thr THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_sampled
        |FROM documents d JOIN q ON d.source = q.source
        |GROUP BY d.source, q.n_docs, q.quota
        |ORDER BY d.source""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select("doc_id", "source")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val q = temperatureQuotas(counts, budgetFrac = 0.5)
      docs.join(broadcast(q), Seq("source"))
        .groupBy("source", "n_docs", "quota")
        .agg(sum(when(substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 4) < col("thr"), 1L).otherwise(0L))
          .as("n_sampled"))
        .orderBy("source")
    },

    // Curriculum pacing schedule: score every document (type-token ratio —
    // an exact-integer-division quality proxy; richer vocabulary ranks
    // earlier), cut each source into quality quintiles, and emit the
    // cumulative phase schedule a curriculum trainer consumes: phase p
    // trains on tiers 1..p, so each row carries both the tier's own mass
    // and the running totals. Per-source quintiles use groupedRanks +
    // ntileFromRank — the q166 decomposition — because `ntile() OVER
    // (PARTITION BY source ...)` funnels each of the 5 fat sources
    // through one reducer at scale; the cumulative windows then run over
    // ONE ROW PER (source, tier) — a 5×5 dimension frame, never the
    // corpus. Exact oracle: integer cores, one rounded avg per cell.
    QueryDef.sql(
      "q177_curriculum_pacing",
      """WITH d AS (SELECT doc_id, source,
        |                  list_filter(string_split(lower(text), ' '),
        |                              x -> x <> '') AS w
        |           FROM documents),
        |     sc AS (SELECT doc_id, source, len(w) AS n_tokens,
        |                   CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
        |                     AS score
        |            FROM d WHERE len(w) > 0),
        |     tiers AS (SELECT source, n_tokens, score,
        |                      ntile(5) OVER (PARTITION BY source
        |                                     ORDER BY score DESC, doc_id)
        |                        AS phase
        |               FROM sc),
        |     ps AS (SELECT source, phase,
        |                   count(*) AS n_docs,
        |                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |                   round(avg(score), 6) AS avg_score
        |            FROM tiers GROUP BY source, phase)
        |SELECT source, phase, n_docs, n_tokens,
        |       CAST(sum(n_docs) OVER (PARTITION BY source ORDER BY phase)
        |            AS BIGINT) AS cum_docs,
        |       CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY phase)
        |            AS BIGINT) AS cum_tokens,
        |       round(CAST(sum(n_docs) OVER (PARTITION BY source
        |                                    ORDER BY phase) AS DOUBLE)
        |             / sum(n_docs) OVER (PARTITION BY source), 6)
        |         AS frac_docs,
        |       avg_score
        |FROM ps ORDER BY source, phase""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val wArr = filter(split(lower(col("text")), " "), x => x =!= "")
      val sc = docs.select(col("doc_id"), col("source"), wArr.as("w"))
        .filter(size(col("w")) > 0)
        .select(col("doc_id"), col("source"),
          size(col("w")).cast("long").as("n_tokens"),
          (size(array_distinct(col("w"))).cast("double") / size(col("w")))
            .as("score"))
      curriculumSchedule(sc)
    },

    // Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    // each doc draws key = u^(1/w) from a deterministic uniform and the
    // global top-k by key IS a weight-proportional sample — the one-pass,
    // shuffle-light way to draw "sample 50 docs, longer docs more likely"
    // at any scale (top-k plans TakeOrderedAndProject, never a global
    // sort). The uniform is a Knuth multiplicative hash of doc_id —
    // pure integer arithmetic, so both engines draw IDENTICAL u — and the
    // ordering key is rounded at 12 dp so a last-ulp pow() difference
    // cannot flip a rank (ties break by doc_id).
    QueryDef.sql(
      "q223_weighted_reservoir",
      """WITH u AS (SELECT doc_id, source, n_chars,
        |                  (CAST(((doc_id % 1000000007) * 2654435761)
        |                        % 4294967296 AS DOUBLE)
        |                   + 0.5) / 4294967296 AS u
        |           FROM documents),
        |     k AS (SELECT doc_id, source, n_chars,
        |                  round(pow(u, 1.0 / n_chars), 12) AS sel_key
        |           FROM u)
        |SELECT doc_id, source, n_chars, sel_key
        |FROM k
        |ORDER BY sel_key DESC, doc_id
        |LIMIT 50""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          (((((col("doc_id") % 1000000007L) * 2654435761L) % 4294967296L)
            .cast("double") + 0.5) / 4294967296L).as("u"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(pow(col("u"), lit(1.0) / col("n_chars")), 12).as("sel_key"))
        .orderBy(col("sel_key").desc, col("doc_id"))
        .limit(50)
    },

    // Chat-template rendering + loss-mask accounting: every SFT pipeline
    // wraps raw documents into a role template and needs to know, per
    // source, how much of the rendered stream actually trains (assistant
    // span) vs is masked (system+user prompt). Rendering is pure row-local
    // string assembly; the mask ratio is a RATIO OF INTEGER SUMS — never
    // an average of per-row ratios, whose float summation order differs
    // between engines. The md5 over the concatenated sample pins the
    // byte-exact rendering itself, not just the lengths.
    QueryDef.sql(
      "q211_chat_template",
      """WITH r AS (
        |  SELECT source,
        |         '<|system|>You are helpful.<|user|>Summarize: '
        |           || substr(text, 1, 100) || '<|assistant|>' || text
        |           || '<|end|>' AS rendered,
        |         length('<|system|>You are helpful.<|user|>Summarize: '
        |                || substr(text, 1, 100) || '<|assistant|>')
        |           AS prompt_chars,
        |         length(text) + length('<|end|>') AS completion_chars
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(prompt_chars) AS BIGINT) AS prompt_chars,
        |       CAST(sum(completion_chars) AS BIGINT) AS completion_chars,
        |       round(CAST(sum(completion_chars) AS DOUBLE)
        |             / (sum(prompt_chars) + sum(completion_chars)), 6)
        |         AS train_frac,
        |       md5(string_agg(substr(rendered, 1, 64), ''
        |                      ORDER BY substr(rendered, 1, 64))) AS sample_md5
        |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val prompt = concat(lit("<|system|>You are helpful.<|user|>Summarize: "),
        substring(col("text"), 1, 100), lit("<|assistant|>"))
      val r = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("source"),
          concat(prompt, col("text"), lit("<|end|>")).as("rendered"),
          length(prompt).as("prompt_chars"),
          (length(col("text")) + lit(7)).as("completion_chars"))
      r.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("prompt_chars").as("prompt_chars"),
          sum("completion_chars").as("completion_chars"),
          round(sum("completion_chars").cast("double") /
            (sum("prompt_chars") + sum("completion_chars")), 6)
            .as("train_frac"),
          md5(concat_ws("", sort_array(collect_list(substring(col("rendered"), 1, 64))))
            .cast("binary")).as("sample_md5"))
        .orderBy("source")
    },

    // Preference-pair construction (RLHF/DPO prep): adjacent docs in the
    // per-source quality ranking become (chosen, rejected) pairs — a
    // deterministic stand-in for human preference labels that preserves
    // the real pipeline shape: rank within source, lag(1), drop ties so
    // chosen is STRICTLY better. One window pass per source; score is the
    // integral n_chars so gaps are exact integers.
    QueryDef.sql(
      "q212_pref_pairs",
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |         lag(doc_id)  OVER w AS worse_id,
        |         lag(n_chars) OVER w AS worse_score
        |  FROM documents
        |  WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id))
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(n_chars - worse_score) AS BIGINT) AS sum_gap,
        |       CAST(max(n_chars - worse_score) AS BIGINT) AS max_gap
        |FROM ranked
        |WHERE worse_id IS NOT NULL AND n_chars > worse_score
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      t(s, d, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"),
          lag("doc_id", 1).over(w).as("worse_id"),
          lag("n_chars", 1).over(w).as("worse_score"))
        .filter(col("worse_id").isNotNull &&
          col("n_chars") > col("worse_score"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("n_chars") - col("worse_score")).as("sum_gap"),
          max(col("n_chars") - col("worse_score")).as("max_gap"))
        .orderBy("source")
    },

    // Stratified k-fold assignment for cross-validation: every document
    // lands in one of 5 folds via a DETERMINISTIC content-independent
    // hash of its id (the q103 md5 discipline — reproducible across
    // engines, runs, and cluster layouts, unlike rand(folds)), reported
    // per (lang, fold) so stratification balance is auditable. One
    // narrow scan + one aggregate; the fold column is the thing a
    // training pipeline materializes next to the data, so the report IS
    // the assignment's contract.
    QueryDef.sql(
      "q261_cv_folds",
      """WITH f AS (
        |  SELECT doc_id, lang,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |              AS BIGINT) % 5 AS fold
        |  FROM documents)
        |SELECT lang, CAST(fold AS BIGINT) AS fold,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM f GROUP BY 1, 2 ORDER BY lang, fold""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("doc_id").cast("string").cast("binary")),
            1, 8), 16, 10).cast("long") % 5).as("fold"))
        .groupBy("lang", "fold")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"))
        .orderBy("lang", "fold")
    },

    // DoReMi-style domain reweighting (Xie et al. 2023, distilled to its
    // batch core): per-domain EXCESS LOSS — how much better a domain-
    // specialist model fits its own tokens than the corpus-wide model,
    // here the exact token-MLE form Σ_w c_dw·ln[(c_dw/n_d)/(c_w/n)]/n_d =
    // KL(domain ‖ corpus) — drives a multiplicative-weights mixture
    // α_d ∝ exp(η·excess), smoothed 20 % toward uniform (the DoReMi
    // regularizer), η = 5. Distinct domains get upweighted, redundant
    // ones damped — the mixture a 100 TB pretraining run feeds its
    // sampler. Determinism: every probability is a ratio of exact integer
    // counts with an identical operand tree; ln rounds at 10 dp per
    // (domain, word); the per-domain excess quantizes to an exact BIGINT
    // in 1e-4 units BEFORE the softmax, whose exp also rounds at 10 dp.
    // Scale shape: ONE tokenize pass (checkpointed) feeds corpus and
    // domain counts (both map-side-combined); the excess reduction runs
    // on the vocabulary-bounded (domain, word) frame — never per token;
    // the softmax is arithmetic on the ≤|domains| frame.
    QueryDef.sql(
      "q286_domain_reweight",
      """WITH tok AS (SELECT source, w
        |             FROM (SELECT source,
        |                          unnest(string_split(lower(text), ' ')) AS w
        |                   FROM documents)
        |             WHERE w <> ''),
        |     cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY w),
        |     ct AS (SELECT count(*) AS ct FROM tok),
        |     dw AS (SELECT source, w, count(*) AS cdw
        |            FROM tok GROUP BY source, w),
        |     dt AS (SELECT source, count(*) AS n_tokens
        |            FROM tok GROUP BY source),
        |     ex AS (SELECT source, n_tokens,
        |                   CAST(round(sum(cdw *
        |                     round(ln((cdw / CAST(n_tokens AS DOUBLE)) /
        |                              (cw / CAST(ct AS DOUBLE))), 10))
        |                     / n_tokens * 1e4) AS BIGINT) AS excess_e4
        |            FROM dw JOIN cw USING (w) JOIN dt USING (source)
        |                 CROSS JOIN ct
        |            GROUP BY source, n_tokens),
        |     wgt AS (SELECT source, n_tokens, excess_e4,
        |                    round(exp(CAST(5.0 AS DOUBLE) * excess_e4 / 1e4),
        |                          10) AS ew
        |             FROM ex),
        |     tot AS (SELECT sum(ew) AS sw, count(*) AS nd FROM wgt)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, excess_e4,
        |       round(CAST(0.8 AS DOUBLE) * ew / sw
        |             + CAST(0.2 AS DOUBLE) / nd, 6) AS weight
        |FROM wgt CROSS JOIN tot
        |ORDER BY source""".stripMargin) { (s, d) =>
      val tok = t(s, d, "documents")
        .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .localCheckpoint(true) // one tokenize pass feeds all four counts
      val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
      val ct = tok.agg(count(lit(1)).as("ct"))
      val dw = tok.groupBy("source", "w").agg(count(lit(1)).as("cdw"))
      val dt = tok.groupBy("source").agg(count(lit(1)).as("n_tokens"))
      val lr = round(log((col("cdw") / col("n_tokens").cast("double")) /
        (col("cw") / col("ct").cast("double"))), 10)
      val ex = dw.join(cw, "w").join(broadcast(dt), "source")
        .crossJoin(broadcast(ct))
        .groupBy("source", "n_tokens")
        .agg(round(sum(col("cdw") * lr) / col("n_tokens") * 1e4, 0)
          .cast("long").as("excess_e4"))
      val wgt = ex.select(col("source"), col("n_tokens"), col("excess_e4"),
          round(exp(lit(5.0) * col("excess_e4") / lit(1e4)), 10).as("ew"))
        .localCheckpoint(true) // ≤ |domains| rows
      val tot = wgt.agg(sum("ew").as("sw"), count(lit(1)).as("nd"))
      wgt.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens").cast("long").as("n_tokens"),
          col("excess_e4"),
          round(lit(0.8) * col("ew") / col("sw")
            + lit(0.2) / col("nd"), 6).as("weight"))
        .orderBy("source")
    }
  )

  /** q177's schedule core, reusable by MixSplitSpec on skewed corpora:
    * from a (doc_id, source, n_tokens, score) frame, cut each source into
    * score-descending quintiles (groupedRanks — no per-source reducer)
    * and emit the cumulative pacing rows. */
  def curriculumSchedule(sc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // bucket = -floor(score*20): monotone NON-DECREASING along the
    // score-DESC sort order, as groupedRanks requires
    val ranked = groupedRanks(sc, Seq("source"),
      (-floor(col("score") * 20)).cast("long"),
      Seq(col("score").desc, col("doc_id")))
    val ps = ranked.withColumn("phase", ntileFromRank(5))
      .groupBy("source", "phase")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        round(avg("score"), 6).as("avg_score"))
    val wCum = Window.partitionBy("source").orderBy("phase")
    val wTot = Window.partitionBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ps.withColumn("cum_docs", sum("n_docs").over(wCum))
      .withColumn("cum_tokens", sum("n_tokens").over(wCum))
      .withColumn("frac_docs",
        round(col("cum_docs").cast("double") / sum("n_docs").over(wTot), 6))
      .select(col("source"), col("phase"), col("n_docs"), col("n_tokens"),
        col("cum_docs"), col("cum_tokens"), col("frac_docs"),
        col("avg_score"))
      .orderBy("source", "phase")
  }
}
