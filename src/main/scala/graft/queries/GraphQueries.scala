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
    }
  )
}
