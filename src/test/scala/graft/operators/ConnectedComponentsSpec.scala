package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ConnectedComponents vs a driver-side union-find oracle.
  *
  * The distributed alternating large/small-star must agree with textbook
  * union-find on arbitrary graphs, and the classic traps are pinned
  * explicitly: self-loops, isolated stars, a long chain (forces multiple
  * rounds — heights halve per round), cliques, and empty input.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Textbook union-find with path compression: node -> min id in component. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val ns = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    ns.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("random graphs match union-find oracle") {
    val edgeGen = for {
      a <- Gen.choose(0L, 40L)
      b <- Gen.choose(0L, 40L)
    } yield (a, b)
    val graphGen = Gen.listOf(edgeGen)
    val prop = Prop.forAll(graphGen) { edges => run(edges) == oracle(edges) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty edge list yields empty output") {
    assert(run(Seq.empty) == Map.empty)
  }

  test("self-loops only: each node is its own singleton component") {
    val edges = Seq((7L, 7L), (3L, 3L), (3L, 3L))
    assert(run(edges) == Map(7L -> 7L, 3L -> 3L))
  }

  test("isolated stars label every leaf and the root with the minimum") {
    // Star rooted at 10 with leaves 11..15 (root NOT the min — min is a leaf),
    // plus a star already rooted at its min.
    val edges = Seq(
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L), (10L, 15L),
      (1L, 20L), (1L, 21L), (1L, 22L))
    val got = run(edges)
    assert(got == oracle(edges))
    assert(got(10L) == 10L && got(15L) == 10L)
    assert(got(1L) == 1L && got(22L) == 1L)
  }

  test("one long chain forces multiple rounds and converges to the min") {
    // Chain 0-1-2-...-200: height 200, halved per round — needs > 2 rounds.
    val edges = (0L until 200L).map(i => (i, i + 1L))
    val got = run(edges)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("chain written high-to-low and shuffled converges the same") {
    val edges = scala.util.Random.shuffle(
      (0L until 120L).map(i => (i + 1L, i)).toList)
    val got = run(edges)
    assert(got.size == 121 && got.values.forall(_ == 0L))
  }

  test("clique plus bridge merges into one component") {
    val clique = for { a <- 5L to 9L; b <- 5L to 9L; if a < b } yield (a, b)
    val edges = clique ++ Seq((9L, 100L), (100L, 3L))
    val got = run(edges)
    assert(got == oracle(edges))
    assert(got.values.toSet == Set(3L))
  }

  test("duplicate and reversed edges do not change the answer") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
    assert(run(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
