package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkTestSession}

/** Semantics pins for the round-8 corpus-analysis operators (q162–q167):
  * the q162 interval merge on hand-built spans, [[groupedRanks]] against
  * the per-group `row_number()` it replaces, and the value-level invariants
  * of RRF fusion, entropy, terciles, and Jensen–Shannon divergence that the
  * DuckDB hash-compare alone would accept any constant for. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("duplicateRuns merges overlapping windows into maximal runs") {
    import spark.implicits._
    // doc 1: dup windows at i=1,2,3 (overlap -> one run [1,18]) and i=30
    // (separate run [30,45]); doc 2 shares the hashes; doc 3's window is
    // unique and must not surface
    val sp = Seq(
      (1L, 1, 60, "a"), (1L, 2, 60, "b"), (1L, 3, 60, "c"), (1L, 30, 60, "d"),
      (2L, 5, 50, "a"), (2L, 6, 50, "b"), (2L, 7, 50, "c"), (2L, 9, 50, "d"),
      (3L, 1, 40, "z")
    ).toDF("doc_id", "i", "n_tokens", "h")
    val got = CorpusQueries.duplicateRuns(sp).orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L), "doc 3 has no dup run")
    val d1 = got(0)
    assert(d1.getLong(1) == 2L, "doc 1: [1..3+15] and [30..45] stay separate")
    assert(d1.getLong(2) == 18L + 16L, "doc 1 covered tokens")
    // doc 2: windows 5,6,7 merge; 9 overlaps the [5,22] run (9 <= 22+1) so
    // ALL FOUR merge into one maximal run [5, 24]
    val d2 = got(1)
    assert(d2.getLong(1) == 1L, "adjacent-within-width windows must merge")
    assert(d2.getLong(2) == 20L, "doc 2 covered tokens = [5..24]")
  }

  test("adjacent-but-not-overlapping runs merge; gap of one token splits") {
    import spark.implicits._
    // width 4: [1,4] and [5,8] are adjacent -> merge to [1,8]; [10,13]
    // leaves a one-token gap at 9 -> separate run
    val sp = Seq(
      (1L, 1, 20, "a"), (1L, 5, 20, "b"), (1L, 10, 20, "c"),
      (2L, 1, 20, "a"), (2L, 5, 20, "b"), (2L, 10, 20, "c")
    ).toDF("doc_id", "i", "n_tokens", "h")
    val got = CorpusQueries.duplicateRuns(sp, width = 4)
      .filter(col("doc_id") === 1L).collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == 8L + 4L)
  }

  test("groupedRanks matches per-group row_number, nulls included") {
    import spark.implicits._
    val rows: Seq[(String, java.lang.Long, Long)] = Seq(
      ("en", 7L, 1L), ("en", 93L, 2L), ("en", null, 3L), ("en", 41L, 4L),
      ("de", 12L, 5L), ("de", 3L, 6L), ("de", null, 7L),
      (null, 55L, 8L), (null, 2L, 9L))
    val df = rows.toDF("g", "k", "id")
    val got = graft.queries.groupedRanks(df, Seq("g"),
      floor(col("k") / 10).cast("long"), Seq(col("k"), col("id")))
    assert(got.count() == rows.size.toLong,
      "null groups and null buckets must survive the offsets join")
    val oracle = df.withColumn("gid", row_number().over(
        Window.partitionBy("g").orderBy(col("k"), col("id"))).cast("long"))
      .withColumn("total", count(lit(1)).over(
        Window.partitionBy("g")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .collect()
      .map(r => (Option(r.get(0)), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    got.select("g", "id", "gid", "total").collect().foreach { r =>
      val key = (Option(r.get(0)), r.getLong(1))
      assert((r.getLong(2), r.getLong(3)) == oracle(key),
        s"gid/total mismatch for $key")
    }
  }

  test("q163 RRF scores recompute from the component ranks") {
    val rows = SparkEntry.queries("q163_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.keySet == Set(0L, 1L, 2L))
    perQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq,
        "ranks must be dense 1..k per query")
    }
    rows.foreach { r =>
      val rsRank = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val rdRank = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(rsRank.isDefined || rdRank.isDefined,
        "a fused row must come from at least one ranking")
      val expect = rsRank.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rdRank.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(5) - expect) < 1e-6,
        s"rrf must be sum of reciprocal ranks: $r")
    }
  }

  test("q164 entropy lies in [0, ln(n_distinct)]") {
    val rows = SparkEntry.queries("q164_char_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3)
      assert(h >= 0.0 && h <= math.log(r.getLong(2).toDouble) + 1e-4,
        s"entropy out of range: $r")
    }
  }

  test("q166 terciles are balanced and ordered by score") {
    val rows = SparkEntry.queries("q166_perplexity_buckets")(spark, sf)
      .collect()
    rows.groupBy(_.getString(0)).values.foreach { bs =>
      assert(bs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      val ns = bs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"tercile sizes must differ by <=1: $ns")
      // head bucket holds the highest log-probs: each bucket's min must
      // dominate the next bucket's max (rounding ties allowed)
      val sorted = bs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(4) >= b.getDouble(5) - 1e-9,
            s"bucket ${a.getLong(1)} min_mlp must be >= bucket ${b.getLong(1)} max_mlp")
        case _ =>
      }
    }
  }

  test("q167 JSD is within [0, ln 2] for every source pair") {
    val rows = SparkEntry.queries("q167_js_divergence")(spark, sf).collect()
    val nSrc = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(rows.length == nSrc * (nSrc - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= -1e-9 && j <= math.log(2.0) + 1e-9, s"JSD out of range: $r")
    }
  }

  test("q168 winnowing density sits near the 2/(w+1) expectation") {
    val rows = SparkEntry.queries("q168_winnowing")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1),
        s"selected fingerprints must be within [1, n_grams]: $r")
    }
    // expectation for w=4 is 2/5; random-ish hash streams land near it
    val density = rows.map(_.getLong(2)).sum.toDouble /
      rows.map(_.getLong(1)).sum
    assert(density > 0.25 && density < 0.55,
      s"aggregate winnowing density $density implausible for w=4")
  }

  test("winnowing guarantee: docs sharing a long run share a fingerprint") {
    import spark.implicits._
    // two docs share a 12-token run (>= w+k-1 = 7 tokens): winnowing MUST
    // select at least one common gram position-content pair in the run
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"x1 x2 x3 $shared y1 y2")
    ).toDF("doc_id", "text")
    val gr = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - 3)).as("i"))
      .select(col("doc_id"), col("i"),
        md5(array_join(slice(col("w"), col("i"), lit(4)), " ")
          .cast("binary")).as("h"))
    val wWin = Window.partitionBy("doc_id").orderBy("i")
    val sel = gr
      .withColumn("hk",
        concat(col("h"), lit("#"), lpad(col("i").cast("string"), 8, "0")))
      .withColumn("mn", min("hk").over(wWin.rowsBetween(0, 3)))
      .withColumn("i_end", lead(col("i"), 3).over(wWin))
      .filter(col("i_end").isNotNull)
      .select(col("doc_id"), substring(col("mn"), 1, 32).as("fp"))
      .distinct()
    val common = sel.filter(col("doc_id") === 1L).select("fp")
      .intersect(sel.filter(col("doc_id") === 2L).select("fp"))
    assert(common.count() >= 1,
      "a 12-token shared run must yield at least one shared fingerprint")
  }

  test("q169 recovers the exponent of an exact power law") {
    import spark.implicits._
    // freq(r) = round(1e6 * r^-1) for r=1..100: ln-ln regression must give
    // slope ~ -1, r2 ~ 1 (rounding of counts perturbs only the 4th digit)
    val docs = (1 to 100).flatMap { r =>
      val n = math.round(1e6 / r).toInt
      // encode frequency via repetition is too big; instead feed the
      // regression core directly
      Seq((r, n))
    }.toDF("r", "n")
    val pts = docs.select(log(col("r").cast("double")).as("x"),
      log(col("n").cast("double")).as("y"))
    val s0 = pts.agg(count(lit(1)).as("m"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
      .collect().head
    val (m, sx, sy, sxx, syy, sxy) = (s0.getLong(0).toDouble, s0.getDouble(1),
      s0.getDouble(2), s0.getDouble(3), s0.getDouble(4), s0.getDouble(5))
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val r2 = math.pow(m * sxy - sx * sy, 2) /
      ((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(slope + 1.0) < 1e-4, s"slope $slope should be -1")
    assert(r2 > 0.999999, s"r2 $r2 should be ~1 for an exact power law")
    // and the registered query's output is shaped sanely on real data
    val rows = SparkEntry.queries("q169_zipf_fit")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0, s"Zipf slope must be negative: $r")
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1 + 1e-9,
        s"r2 out of [0,1]: $r")
    }
  }

  test("q171 diversity: hits bounded by gram counts; overlap in [0,1]") {
    val rows = SparkEntry.queries("q171_ngram_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3),
        s"hits cannot exceed distinct grams: $r")
      val o = r.getDouble(5)
      assert(o >= 0.0 && o <= 1.0, s"overlap2 out of range: $r")
    }
  }

  test("distinct-gram df>=2 reduction: a verbatim copy scores overlap 1, unique vocab 0") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),     // copied verbatim by doc 2
      (1L, "zeta eta theta iota"),        // fully unique vocabulary
      (2L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val u1 = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("g")).distinct()
    val df = u1.groupBy("g").agg(count(lit(1)).as("df"))
    val p = u1.join(df, "g").groupBy("doc_id")
      .agg((sum(when(col("df") >= 2, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("p1"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p(0L) == 1.0 && p(2L) == 1.0,
      "every gram of a duplicated doc occurs elsewhere")
    assert(p(1L) == 0.0, "no gram of a unique-vocab doc occurs elsewhere")
  }

  test("q172 k-anonymity: cells partition the corpus; risky iff k < 5") {
    val rows = SparkEntry.queries("q172_k_anonymity")(spark, sf).collect()
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(3)).sum == total,
      "QI cells must partition the corpus exactly")
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(3) < 5), s"risky flag wrong: $r")
    }
  }

  test("JSD of a source against an identical copy is zero") {
    import spark.implicits._
    // two sources with identical token multisets -> p == q everywhere ->
    // core terms ln(1)=0 and no disjoint mass
    val docs = Seq(
      (1L, "alpha beta beta gamma", "en", "sA", 21L),
      (2L, "alpha beta beta gamma", "en", "sB", 21L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("corpus_jsd_tmp")
    val pw = docs.select(col("source"),
        explode(filter(split(lower(col("text")), " "), w => w =!= ""))
          .as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n"))
    val pn = pw.groupBy("source").agg(sum("n").as("tn"))
    val p = pw.join(pn, "source")
      .select(col("source"), col("word"),
        (col("n").cast("double") / col("tn")).as("p"))
    val a = p.select(col("source").as("s1"), col("word"), col("p").as("pa"))
    val b = p.select(col("source").as("s2"), col("word"), col("p").as("pb"))
    val jsd = a.join(b, Seq("word")).filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(sum(lit(0.5) * col("pa") *
          log(lit(2) * col("pa") / (col("pa") + col("pb"))) +
        lit(0.5) * col("pb") *
          log(lit(2) * col("pb") / (col("pa") + col("pb")))).as("core"),
        sum("pa").as("pa"), sum("pb").as("pb"))
      .select((col("core") +
        lit(0.5) * log(lit(2.0)) * (lit(2.0) - col("pa") - col("pb")))
        .as("jsd"))
      .collect().head.getDouble(0)
    assert(math.abs(jsd) < 1e-12)
  }

  test("noveltyPerDoc: verbatim copies score zero; originals score one") {
    import spark.implicits._
    // doc 1 introduces all its shingles (novelty 1); doc 2 copies doc 1
    // verbatim (novelty 0); doc 3 shares a prefix trigram with doc 1 but
    // adds new ones; doc 4 is too short for any shingle and must drop
    val docs = Seq(
      (1L, "a b c d", "en", "s", 7L),
      (2L, "a b c d", "en", "s", 7L),
      (3L, "a b c x y", "en", "s", 9L),
      (4L, "a b", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val per = CorpusQueries.noveltyPerDoc(docs)
      .select($"doc_id", $"n_grams", $"n_new").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(per.keySet == Set(1L, 2L, 3L), "doc 4 has no trigram")
    assert(per(1L) == (2L, 2L), s"doc 1 all-new: ${per(1L)}")
    assert(per(2L) == (2L, 0L), s"doc 2 verbatim copy all-seen: ${per(2L)}")
    // doc 3: shingles {a b c, b c x, c x y} — only the first is old
    assert(per(3L) == (3L, 2L), s"doc 3 mixed: ${per(3L)}")
  }
}
