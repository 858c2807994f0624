package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    Triangles.count(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Long, Double)].head()

  test("K4: 4 triangles, 12 wedges, clustering 1") {
    val k4 = for { i <- 0L to 3L; j <- 0L to 3L if i < j } yield (i, j)
    val (n, e, w, t, c) = census(k4)
    assert((n, e, w, t) == (4L, 6L, 12L, 4L))
    assert(c == 1.0)
  }

  test("C5 (5-cycle): 0 triangles; pendant triangle graph: 1") {
    val c5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    assert(census(c5)._4 == 0L)
    // triangle 0-1-2 with pendant 3 hanging off node 0
    val pend = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L))
    val (n, e, w, t, _) = census(pend)
    assert((n, e, w, t) == (4L, 4L, 5L, 1L))
  }

  test("duplicates, reversed direction, and self-loops are normalized away") {
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L),
      (1L, 1L), (2L, 2L))
    val (n, e, _, t, _) = census(messy)
    assert((n, e, t) == (3L, 3L, 1L))
  }

  test("matches brute-force enumeration on a deterministic hash graph") {
    // ~60-node graph with hash-derived edges: enough irregularity to
    // exercise the degree orientation's both branches and tie-breaks
    val edges = (for {
      i <- 0L until 60L
      j <- i + 1 until 60L
      if (i * 7919 + j * 104729) % 17 == 0
    } yield (i, j)).toSeq
    val adj = edges.toSet
    def has(a: Long, b: Long) = adj.contains((a min b, a max b))
    val brute = (for {
      a <- 0L until 60L; b <- a + 1 until 60L; c <- b + 1 until 60L
      if has(a, b) && has(b, c) && has(a, c)
    } yield 1).size.toLong
    assert(brute > 0, "degenerate fixture: no triangles to check")
    assert(census(edges)._4 == brute)
  }
}
