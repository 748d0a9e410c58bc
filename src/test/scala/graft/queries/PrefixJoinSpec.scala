package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.VectorFunctions

/** Pins q122's PPJoin filter stack (round-10 verdict #3):
  *
  *  - the native early-exit verify kernel `sortedIntersectAtLeast` must
  *    agree with `sortedIntersectCount >= alpha` on every input (the
  *    early exit is an optimization, never a semantic change), in both
  *    interpreted and codegen paths;
  *  - the asymmetric-prefix + length + positional candidate generation
  *    must be COMPLETE: on a corpus where the true Jaccard>=0.8 pairs
  *    are known by brute force, the registered q122 query finds exactly
  *    those pairs (prefix filtering is an exact method — any false
  *    negative is a correctness bug, not a recall trade-off).
  */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("early-exit intersect-at-least == full count >= alpha (incl. edges)") {
    val rnd = new java.util.Random(7)
    val rows = (0 until 300).map { i =>
      val na = rnd.nextInt(30)
      val nb = rnd.nextInt(30)
      // overlapping universes so intersections actually occur
      val a = Seq.fill(na)(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(nb)(rnd.nextInt(40).toLong).distinct.sorted
      val alpha = rnd.nextInt(12).toLong // 0 is a valid (always-true) bound
      (i.toLong, a, b, alpha)
    } :+ ((300L, Seq.empty[Long], Seq(1L, 2L), 1L)) :+
      ((301L, Seq.empty[Long], Seq.empty[Long], 0L))
    val df = rows.toDF("id", "a", "b", "alpha")
    val got = df.select($"id",
      VectorFunctions.sortedIntersectAtLeast($"a", $"b", $"alpha").as("fast"),
      (VectorFunctions.sortedIntersectCount($"a", $"b") >= $"alpha").as("ref"))
      .as[(Long, Boolean, Boolean)].collect()
    got.foreach { case (id, fast, ref) =>
      assert(fast == ref, s"row $id: early-exit=$fast full=$ref")
    }
  }

  test("early-exit kernel survives codegen in a filter pipeline") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    val n = df.filter(
      VectorFunctions.sortedIntersectAtLeast($"a", $"b", lit(2L))).count()
    assert(n == 1)
  }

  test("q122 candidate generation is complete vs brute-force Jaccard") {
    // Adversarially dense corpus (tiny vocabulary, like the driver's):
    // near-dup pairs by construction plus random text — brute force over
    // ALL pairs is the truth; q122's asymmetric-prefix + length +
    // positional filters must lose none of it.
    val dir = java.nio.file.Files.createTempDirectory("q122spec").toString
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    val rnd = new java.util.Random(13)
    def text(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(6))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, text(8 + rnd.nextInt(20))))
    // inject noisy near-copies of the first 10 (small suffix edit)
    val copies = (0 until 10).map(i => (1000L + i, base(i)._2 + " zz"))
    (base ++ copies).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q122_prefix_setjoin")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force on the SAME derived universe (withNoisyCopies + 3-gram
    // sets), via the registered tokenizer to avoid re-implementing it
    val docs = graft.Tables.documents(spark, dir)
      .filter($"source" === "src0").select($"doc_id", $"text")
    val d2 = docs.unionByName(docs.select(
      ($"doc_id" + 1099511627776L).as("doc_id"), // the 2^40 copy offset
      concat(upper($"text"), lit(" !!")).as("text")))
    val sets = d2.select($"doc_id",
      array_distinct(graft.dedup.Dedup.charNgrams(lower($"text"))).as("s"))
    val brute = sets.as("a").join(sets.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        size(array_intersect($"a.s", $"b.s")).cast("long").as("inter"),
        (size($"a.s") + size($"b.s") -
          size(array_intersect($"a.s", $"b.s"))).cast("long").as("uni"))
      .filter($"uni" > 0 && $"inter" * 5 >= $"uni" * 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "test corpus must actually contain near-dups")
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }
}
