package graft

import org.apache.spark.sql.DataFrame
import graft.operators.GraphOps

/** connectedComponents vs a JVM union-find oracle on adversarial graph
  * shapes — including a long path, which converges only because of the
  * pointer-jump step (plain 1-hop hash-min needs one round per hop).
  */
class GraphOpsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // component id = min member id; path compression keeps roots minimal
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def ccOf(n: Int, edges: Seq[(Long, Long)],
                   maxIter: Int = 50): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    val nodes: DataFrame = (0L until n.toLong).toDF("id")
    val es: DataFrame =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
      else edges.toDF("a", "b")
    GraphOps.connectedComponents(nodes, es, maxIter).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
  }

  test("matches union-find on a seeded sparse random graph") {
    val n = 300
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(220)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    assert(ccOf(n, edges) == unionFind(n, edges))
  }

  test("collapses a 180-node path (diameter stress — needs pointer jumping)") {
    val n = 180
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val got = ccOf(n, edges)
    assert(got == unionFind(n, edges))
    assert(got.values.toSet == Set(0L), "one component labeled by min id")
  }

  test("two cliques joined by a bridge merge; an isolated node stays solo") {
    val cliqueA = for (i <- 0 until 10; j <- i + 1 until 10)
      yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 until 20; j <- i + 1 until 20)
      yield (i.toLong, j.toLong)
    val edges = cliqueA ++ cliqueB ++ Seq((9L, 10L))  // node 20 isolated
    val got = ccOf(21, edges)
    assert(got == unionFind(21, edges))
    assert((0 until 20).forall(i => got(i.toLong) == 0L))
    assert(got(20L) == 20L)
  }

  test("edge orientation, duplicates and self-loops are tolerated") {
    val edges = Seq((3L, 1L), (1L, 3L), (3L, 1L), (2L, 2L), (0L, 4L))
    val got = ccOf(5, edges)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }
}
