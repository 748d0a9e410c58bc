package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Training-data pipeline operations beyond dedup/search (SURVEY.md §7.4
  * posture): embedding normalization + quantization for storage,
  * reproducible dataset splits, and funnel analytics. Exact arithmetic
  * throughout so every query is oracle-checked.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // Embedding norm + int8 quantization summary: the storage-prep pass of a
    // vector pipeline. floor() quantization (exact in both engines) against
    // the per-vector max-abs scale; checksum is an exact integer.
    QueryDef.sql(
      "q54_embed_quantize",
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
        |  CAST(list_sum(list_transform(embedding,
        |        x -> floor(CAST(x AS DOUBLE) * 127.0 /
        |             list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))))))
        |       AS BIGINT) AS q8_checksum
        |FROM embeddings
        |WHERE vec_id < 200
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = col("embedding")
      val maxAbs = array_max(transform(e, y => abs(y.cast("double"))))
      t(s, d, "embeddings")
        .filter(col("vec_id") < 200)
        .select(col("vec_id"),
          round(sqrt(aggregate(
            transform(e, x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, v) => acc + v)), 6).as("l2_norm"),
          aggregate(
            transform(e, x => floor(x.cast("double") * 127.0 / maxAbs)),
            lit(0.0), (acc, v) => acc + v).cast("long").as("q8_checksum"))
        .orderBy("vec_id")
    },

    // Reproducible train/val/test split: assignment from the first hex char
    // of md5(doc_id) — engine-independent, stable under re-runs and
    // partitioning (the property random() splits lack).
    QueryDef.sql(
      "q55_dataset_split",
      """SELECT lang, split, count(*) AS n_docs
        |FROM (SELECT lang,
        |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM documents)
        |GROUP BY lang, split
        |ORDER BY lang, split""".stripMargin) { (s, d) =>
      val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
      t(s, d, "documents")
        .select(col("lang"),
          when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
            .as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split")
    },

    // Stratified fixed-size sampling: exactly 20 docs per language, picked
    // by md5 hash order — reproducible across re-runs, engines, and cluster
    // sizes (the property a random()-based sample lacks), and balanced
    // across strata (the property a global hash-threshold sample lacks).
    // Scale note: the ranking window sorts each stratum; when k ≪ stratum
    // size, the same semantics run as a map-side partial top-k (the
    // TopKAggregator q52 pins) — the window form is kept here because it is
    // the oracle-comparable one.
    QueryDef.sql(
      "q88_stratified_sample",
      """WITH h AS (SELECT doc_id, lang,
        |                  md5(CAST(doc_id AS VARCHAR)) AS hk
        |           FROM documents),
        |     r AS (SELECT doc_id, lang, hk,
        |                  row_number() OVER (PARTITION BY lang
        |                                     ORDER BY hk, doc_id) AS rn
        |           FROM h)
        |SELECT lang, rn AS rank, doc_id
        |FROM r WHERE rn <= 20
        |ORDER BY lang, rank""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy(col("hk"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string").cast("binary")).as("hk"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select("lang", "rank", "doc_id")
        .orderBy("lang", "rank")
    },

    // As-of join: each purchase annotated with the user's latest prior view
    // — implemented as the single-pass union+window technique (AsOfJoin), no
    // range-join row explosion; oracled against the correlated formulation.
    QueryDef.sql(
      "q57_asof_join",
      """SELECT p.event_id, p.user_id, p.ts,
        |       (SELECT v.event_id FROM events v
        |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |          AND v.ts <= p.ts
        |        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS prior_event_id
        |FROM events p
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id")
      AsOfJoin.joinPrior(purchases, views,
          key = "user_id", tsLeft = "ts", tsRight = "ts",
          tiebreak = col("event_id"))
        .orderBy("event_id")
    },

    // The same as-of lookup through the NATIVE physical operator
    // (graftx.AsOfJoinExec: logical node + planner strategy + sort-merge
    // exec — extension tier (c)); oracle identical to q57, so the driver
    // gate itself pins exec-vs-composition parity. AsOfJoinSpec pins the
    // plan shape (AsOfJoinExec present, no window, no union).
    QueryDef.sql(
      "q133_asof_native",
      """SELECT p.event_id, p.user_id, p.ts,
        |       (SELECT v.event_id FROM events v
        |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |          AND v.ts <= p.ts
        |        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS prior_event_id
        |FROM events p
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
          col("event_id").as("v_event_id"))
      org.apache.spark.sql.graftx.AsOfJoinDsl.joinPrior(
          purchases, views, leftKey = "user_id", rightKey = "v_user_id",
          leftTs = "ts", rightTs = "v_ts", rightTiebreak = "v_event_id")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("v_event_id").as("prior_event_id"))
        .orderBy("event_id")
    },

    // Ordered conversion funnel: users who viewed, then clicked after their
    // first view, then purchased after that click — min-timestamp stage
    // comparisons, exact µs both engines.
    QueryDef.sql(
      "q56_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS t FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |     c AS (SELECT e.user_id, min(e.ts) AS t
        |           FROM events e JOIN v ON e.user_id = v.user_id
        |           WHERE e.event_type = 'click' AND e.ts > v.t
        |           GROUP BY e.user_id),
        |     p AS (SELECT e.user_id, min(e.ts) AS t
        |           FROM events e JOIN c ON e.user_id = c.user_id
        |           WHERE e.event_type = 'purchase' AND e.ts > c.t
        |           GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_viewed,
        |       (SELECT count(*) FROM c) AS n_clicked_after,
        |       (SELECT count(*) FROM p) AS n_purchased_after""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("vt"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("vt"))
        .groupBy("user_id").agg(min("ts").as("ct"))
      val p = ev.filter(col("event_type") === "purchase").as("e2")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("ct"))
        .groupBy("user_id").agg(min("ts").as("pt"))
      // explicit broadcast of the 1-row funnel aggregates: AQE broadcasts
      // them anyway, but the hint makes the plan deterministic
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_clicked_after"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchased_after"))))
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // per-item key u^(1/w) with u a DETERMINISTIC md5-derived uniform, top-5
    // per language stratum — longer documents proportionally likelier, yet
    // the draw is reproducible across re-runs, engines, and cluster sizes
    // (the property rand()-weighted sampling lacks). One narrow pass to key,
    // one per-stratum top-k; at scale the k ≪ stratum window runs as a
    // map-side partial top-k exactly like q88.
    QueryDef.sql(
      "q103_weighted_sample",
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |         pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |                   AS BIGINT) + 0.5) / 4294967296.0,
        |             1.0 / n_chars) AS pr
        |  FROM documents),
        |r AS (SELECT doc_id, lang, n_chars,
        |             row_number() OVER (PARTITION BY lang
        |                                ORDER BY pr DESC, doc_id) AS rank
        |      FROM h)
        |SELECT lang, rank, doc_id, n_chars
        |FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin) { (s, d) =>
      val hv = conv(substring(
          md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
      val u = (hv.cast("double") + 0.5) / 4294967296.0
      val w = Window.partitionBy("lang")
        .orderBy(col("pr").desc, col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          pow(u, lit(1.0) / col("n_chars")).as("pr"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("lang", "rank", "doc_id", "n_chars")
        .orderBy("lang", "rank")
    }
  )
}
