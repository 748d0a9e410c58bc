package graft.queries

import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate document graph: triangle
  * counting (cluster-density measure — a high triangle-to-edge ratio means
  * the pairwise near-dup verdicts are mutually consistent, a low one means
  * chained borderline matches that component-collapse would over-merge).
  */
object GraphQueries {

  val defs: Seq[QueryDef] = Seq(

    // Triangle census of the n-gram-Jaccard near-dup graph on a TRIPLED
    // src0 slice (three copies of every doc ⇒ every doc sits in at least
    // one 3-clique, so the count is provably non-trivial). Spark side: the
    // banded pair miner (q43's shape) feeds degree-ordered-orientation
    // triangle counting (graft.ml.Triangles) — equi-joins only, wedge
    // fan-out bounded O(√m) per node. Oracle: the direct a<b<c three-way
    // self-join over the same pair set.
    QueryDef.sql(
      "q102_triangle_count",
      s"""WITH d2 AS (
        |  SELECT doc_id, lang, n_chars, text FROM documents WHERE source = 'src0'
        |  UNION ALL
        |  SELECT doc_id + 100000, lang, n_chars, text FROM documents WHERE source = 'src0'
        |  UNION ALL
        |  SELECT doc_id + 200000, lang, n_chars, text FROM documents WHERE source = 'src0'),
        |${graft.queries.DedupQueries.pairCteSql("d2")},
        |pe AS (SELECT id_a AS u, id_b AS v FROM p),
        |n AS (SELECT count(DISTINCT id) AS n_nodes
        |      FROM (SELECT u AS id FROM pe UNION ALL SELECT v FROM pe)),
        |m AS (SELECT count(*) AS n_edges FROM pe),
        |tr AS (SELECT count(*) AS n_triangles
        |       FROM pe e1 JOIN pe e2 ON e2.u = e1.v
        |                  JOIN pe e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |       CAST(n_edges AS BIGINT) AS n_edges,
        |       CAST(n_triangles AS BIGINT) AS n_triangles
        |FROM n, m, tr""".stripMargin) { (s, d) =>
      val src0 = t(s, d, "documents").filter(col("source") === "src0")
        .select("doc_id", "lang", "n_chars", "text")
      val tripled = src0
        .unionByName(src0.withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(src0.withColumn("doc_id", col("doc_id") + 200000))
      val edges = DedupQueries.ngramPairs(tripled, 0.7)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      graft.ml.Triangles.count(edges)
    },

    // Bounded-hop BFS distances from the minimum node over the same
    // near-dup graph — single-source shortest paths, the graph primitive
    // CC (q78), PageRank (q100), LPA (q144), and triangles (q102) leave
    // uncovered. Four synchronous frontier-relaxation rounds (dist ←
    // min(dist, neighbor+1)): per round ONE shuffle join frontier⋈edges +
    // a min-aggregate, O(rounds) not O(paths) — the oracle's recursive
    // CTE enumerates paths instead, which DuckDB can afford at gate scale
    // and a 100 TB graph cannot. All-integer distances.
    QueryDef.sql(
      "q231_bfs_distances",
      s"""WITH RECURSIVE d2 AS (
        |  SELECT doc_id, lang, n_chars, text FROM documents WHERE source = 'src0'
        |  UNION ALL
        |  SELECT doc_id + 100000, lang, n_chars, text FROM documents WHERE source = 'src0'
        |  UNION ALL
        |  SELECT doc_id + 200000, lang, n_chars, text FROM documents WHERE source = 'src0'),
        |${graft.queries.DedupQueries.pairCteSql("d2")},
        |pe AS (SELECT id_a AS u, id_b AS v FROM p
        |       UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, dist) AS (
        |  SELECT (SELECT min(id_a) FROM p), 0
        |  UNION ALL
        |  SELECT e.v, r.dist + 1 FROM reach r JOIN pe e ON e.u = r.node
        |  WHERE r.dist < 4)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM (SELECT node, min(dist) AS dist FROM reach GROUP BY node)
        |GROUP BY dist ORDER BY dist""".stripMargin) { (s, d) =>
      val src0 = t(s, d, "documents").filter(col("source") === "src0")
        .select("doc_id", "lang", "n_chars", "text")
      val tripled = src0
        .unionByName(src0.withColumn("doc_id", col("doc_id") + 100000))
        .unionByName(src0.withColumn("doc_id", col("doc_id") + 200000))
      val pairs = DedupQueries.ngramPairs(tripled, 0.7)
        .select("id_a", "id_b").localCheckpoint(true)
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      var dist = pairs.agg(min("id_a").as("node"))
        .select(col("node"), lit(0).as("dist"))
      for (_ <- 1 to 4) {
        dist = dist.unionByName(
            dist.join(edges, col("node") === col("u"))
              .select(col("v").as("node"), (col("dist") + 1).as("dist")))
          .groupBy("node").agg(min("dist").as("dist"))
      }
      dist.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    },

    // Label-propagation communities over the near-dup graph (doubled src0
    // slice, the q78 pair set): 3 SYNCHRONOUS rounds, each node adopting
    // the most frequent neighbor label with ties to the smallest — all
    // integer arithmetic, so unlike PageRank (q100, rows-only) community
    // detection is fully oracle-checked (the oracle unrolls the same 3
    // rounds). Per round: one shuffle join edges⋈labels + two partial
    // aggregates; round count fixed, labels are 8-byte ids.
    QueryDef.sql(
      "q144_label_prop",
      s"""WITH d2 AS (
        |  SELECT doc_id, lang, n_chars, text FROM documents WHERE source = 'src0'
        |  UNION ALL
        |  SELECT doc_id + 100000, lang, n_chars, text FROM documents WHERE source = 'src0'),
        |${graft.queries.DedupQueries.pairCteSql("d2")},
        |e AS (SELECT id_a AS u, id_b AS v FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),
        |r1 AS (SELECT e.u AS node, l.label, count(*) AS c
        |       FROM e JOIN l0 l ON l.node = e.v GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |        SELECT node, label, row_number() OVER (
        |          PARTITION BY node ORDER BY c DESC, label) AS rn FROM r1)
        |       WHERE rn = 1),
        |r2 AS (SELECT e.u AS node, l.label, count(*) AS c
        |       FROM e JOIN l1 l ON l.node = e.v GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |        SELECT node, label, row_number() OVER (
        |          PARTITION BY node ORDER BY c DESC, label) AS rn FROM r2)
        |       WHERE rn = 1),
        |r3 AS (SELECT e.u AS node, l.label, count(*) AS c
        |       FROM e JOIN l2 l ON l.node = e.v GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (
        |        SELECT node, label, row_number() OVER (
        |          PARTITION BY node ORDER BY c DESC, label) AS rn FROM r3)
        |       WHERE rn = 1)
        |SELECT node AS doc_id, CAST(label AS BIGINT) AS community
        |FROM l3
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val src0 = t(s, d, "documents").filter(col("source") === "src0")
        .select("doc_id", "lang", "n_chars", "text")
      val doubled = src0.unionByName(
        src0.withColumn("doc_id", col("doc_id") + 100000))
      val pairs = DedupQueries.ngramPairs(doubled, 0.7).localCheckpoint(true)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct()
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 0 until 3) {
        labels = edges
          .join(labels.select(col("node").as("dst"), col("label")), "dst")
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
          .groupBy("src")
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("b"))
          .select(col("src").as("node"), (-col("b.nl")).as("label"))
      }
      labels.select(col("node").as("doc_id"), col("label").as("community"))
        .orderBy("doc_id")
    },

    // Temporal (time-respecting) reachability — the graph primitive static
    // BFS (q231) cannot express: a path is valid only if edge timestamps
    // are non-decreasing along it, the semantics of influence/contagion
    // analysis. The temporal graph derives from the event stream: within
    // each props.k channel, consecutive events by DIFFERENT users form a
    // directed edge (prev_user → user) stamped with the later event's
    // time — one lag() window over (k, ts). Seeds are day-1 signups with
    // their signup time as arrival. Three relaxation rounds of earliest-
    // arrival: arr'(v) = min(arr(v), min over edges u→v with t ≥ arr(u)
    // of t) — each round one equi-join on the skinny (node, arr) frame +
    // a min aggregate, the label-relaxation shape that distributes like
    // any join (no per-path state; paths never materialize). The oracle
    // unrolls the same three rounds as CTEs, so the fixed-depth result is
    // EXACT in both engines, not a convergence approximation.
    QueryDef.sql(
      "q244_temporal_reach",
      """WITH ek AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |         ts, event_id, user_id
        |  FROM events),
        |chain AS (
        |  SELECT k, user_id, ts,
        |         lag(user_id) OVER (PARTITION BY k ORDER BY ts, event_id)
        |           AS prev_user
        |  FROM ek),
        |edges AS (
        |  SELECT prev_user AS src, user_id AS dst, ts
        |  FROM chain WHERE prev_user IS NOT NULL AND prev_user <> user_id),
        |seed AS (
        |  SELECT user_id, min(ts) AS arr FROM events
        |  WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-02'
        |  GROUP BY user_id),
        |r1 AS (SELECT dst AS user_id, min(e.ts) AS arr
        |       FROM edges e JOIN seed s ON e.src = s.user_id AND e.ts >= s.arr
        |       GROUP BY dst),
        |a1 AS (SELECT user_id, min(arr) AS arr FROM
        |       (SELECT * FROM seed UNION ALL SELECT * FROM r1) GROUP BY user_id),
        |r2 AS (SELECT dst AS user_id, min(e.ts) AS arr
        |       FROM edges e JOIN a1 ON e.src = a1.user_id AND e.ts >= a1.arr
        |       GROUP BY dst),
        |a2 AS (SELECT user_id, min(arr) AS arr FROM
        |       (SELECT * FROM a1 UNION ALL SELECT * FROM r2) GROUP BY user_id),
        |r3 AS (SELECT dst AS user_id, min(e.ts) AS arr
        |       FROM edges e JOIN a2 ON e.src = a2.user_id AND e.ts >= a2.arr
        |       GROUP BY dst),
        |a3 AS (SELECT user_id, min(arr) AS arr FROM
        |       (SELECT * FROM a2 UNION ALL SELECT * FROM r3) GROUP BY user_id)
        |SELECT user_id, arr AS earliest_arrival
        |FROM a3 ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy("ts", "event_id")
      val ev = t(s, d, "events")
      val edges = ev
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("ts"), col("event_id"), col("user_id"))
        .withColumn("prev_user", lag("user_id", 1).over(w))
        .filter(col("prev_user").isNotNull && col("prev_user") =!= col("user_id"))
        .select(col("prev_user").as("src"), col("user_id").as("dst"), col("ts"))
        .localCheckpoint(true) // feeds all three relaxation rounds
      var arr = ev
        .filter(col("event_type") === "signup" &&
          col("ts") < lit("2024-01-02").cast("timestamp"))
        .groupBy("user_id").agg(min("ts").as("arr"))
      for (_ <- 0 until 3) {
        val relaxed = edges
          .join(arr.select(col("user_id").as("src"), col("arr").as("src_arr")),
            "src")
          .filter(col("ts") >= col("src_arr"))
          .groupBy(col("dst").as("user_id"))
          .agg(min(col("ts")).as("arr"))
        arr = arr.unionByName(relaxed)
          .groupBy("user_id").agg(min("arr").as("arr"))
      }
      arr.select(col("user_id"), col("arr").as("earliest_arrival"))
        .orderBy("user_id")
    }
  )
}
