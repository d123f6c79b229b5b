package graft.queries

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import graft.operators.{Boilerplate, ManagedCache, Triangles}
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the round-7 additions: repetition
  * signals (tx15), boilerplate removal (px6), and degree-oriented
  * triangle enumeration (xg2). The oracle gate proves engine-vs-
  * engine equality; these pin answers known by construction.
  */
class GraphTextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("topRepeatCount finds the modal element count; empty array is 0") {
    val df = Seq(
      Tuple1(Seq("b", "a", "b", "c", "b")),
      Tuple1(Seq("x")),
      Tuple1(Seq.empty[String])).toDF("arr")
    val got = df.select(TF.topRepeatCount(col("arr"))).as[Long].collect()
    assert(got.toSeq == Seq(3L, 1L, 0L))
  }

  test("adjacentBigrams keeps multiplicity and order; short docs empty") {
    val df = Seq("a b a b a", "solo", "").toDF("text")
      .select(TF.adjacentBigrams(TF.tokens(col("text"))).as("bg"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b a", "a b", "b a"))
    assert(got(1) == Seq.empty)
    // ""-trim split yields [""] (one empty token) → still no bigram
    assert(got(2) == Seq.empty)
  }

  test("boilerplate chunk in >=3 docs is dropped from ALL docs, " +
    "df=2 chunk survives") {
    // 5-token chunks; docs 1-3 share chunk A (df=3, boilerplate),
    // docs 1-2 share chunk B as their second chunk (df=2, kept)
    val chunkA = "nav home about contact legal"
    val chunkB = "shared body text goes here"
    val docs = Seq(
      (1L, s"$chunkA $chunkB"),
      (2L, s"$chunkA $chunkB"),
      (3L, s"$chunkA unique three words here now"),
      (4L, "completely different document body text")).toDF("doc_id", "text")
    val got = Boilerplate.remove(docs, n = 5, minDf = 3)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    ManagedCache.releaseAll()
    assert(got(0) == ((1L, chunkB, 2L, 1L)))
    assert(got(1) == ((2L, chunkB, 2L, 1L)))
    assert(got(2) == ((3L, "unique three words here now", 2L, 1L)))
    assert(got(3) == ((4L, "completely different document body text",
      1L, 0L)))
  }

  test("triangle enumeration on K4 plus a hub star matches the naive " +
    "id-ordered count") {
    // K4 on {1,2,3,4} → 4 triangles; star hub 100 with leaves
    // 10..30 → 0 triangles (no leaf-leaf edges); one extra triangle
    // through the hub: (100, 10, 11) via edge (10, 11)
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val star = (10L to 30L).map(leaf => (leaf, 100L))
    val edges = (k4 ++ star :+ ((10L, 11L))).toDF("u", "v")
    val tri = Triangles.enumerate(edges)
      .collect().map(r => {
        val s = Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted
        (s(0), s(1), s(2))
      }).toSet
    ManagedCache.releaseAll()
    // naive reference: all id-ordered triples with 3 edges present
    val eset = (k4 ++ star :+ ((10L, 11L)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = eset.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = (for {
      a <- nodes; b <- nodes if a < b && eset((a, b))
      c <- nodes if b < c && eset((b, c)) && eset((a, c))
    } yield (a, b, c)).toSet
    assert(tri == naive)
    assert(tri.size == 5)
  }

  test("triangle count is stable under input partitioning") {
    val edges = (for {
      a <- 1L to 9L; b <- 1L to 9L if a < b && (a + b) % 3 != 0
    } yield (a, b)).toDF("u", "v")
    val n1 = Triangles.enumerate(edges.repartition(1)).count()
    val n7 = Triangles.enumerate(edges.repartition(7)).count()
    ManagedCache.releaseAll()
    assert(n1 == n7)
  }
}
