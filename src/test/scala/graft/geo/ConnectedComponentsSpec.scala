package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import scala.util.Random

/** DataFrame-native connected components (large-star/small-star) vs a
  * scalar union-find oracle, over graph shapes that stress different
  * convergence paths: long chains (high diameter), grids, random sparse
  * graphs, stars, duplicate/self-loop noise. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long](n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id labeling
    val label = scala.collection.mutable.Map[Long, Long]()
    n.sorted.foreach { x => val r = find(x); if (!label.contains(r)) label(r) = x }
    n.map(x => x -> label(find(x))).toMap
  }

  test("matches union-find on chains, grids, random graphs, noise") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("cc-spec")
      .getOrCreate()
    import spark.implicits._
    try {
      val rnd = new Random(42)
      // 1. one 400-node chain (diameter 399 — kills O(diameter) algorithms)
      val chain = (0L until 399L).map(i => (i, i + 1))
      // 2. 10x10 grid offset at 1000
      val grid = (for { r <- 0 until 10; c <- 0 until 10 } yield {
        val id = 1000L + r * 10 + c
        Seq(if (c < 9) Some((id, id + 1)) else None,
            if (r < 9) Some((id, id + 10)) else None).flatten
      }).flatten
      // 3. random sparse graph at 2000 (150 nodes, 120 edges)
      val rand = (0 until 120).map { _ =>
        (2000L + rnd.nextInt(150), 2000L + rnd.nextInt(150))
      }
      // 4. star at 5000 with reversed orientation + dup + self-loop noise
      val star = (1L to 30L).map(i => (5000L + i, 5000L))
      val noise = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5000L, 5000L))

      val all = chain ++ grid ++ rand ++ star ++ noise
      // contract: self-loop-only nodes are absent from the output (callers
      // left-join + coalesce(cluster, node))
      val real = all.filter(e => e._1 != e._2)
      val nodes = real.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = unionFind(nodes, real)

      // both execution paths must agree with the oracle: the bounded
      // single-task finish (default threshold) and the large-star/
      // small-star loop (threshold 0 forces it)
      for (threshold <- Seq(1L << 22, 0L)) {
        val got = ConnectedComponents
          .label(spark, all.toDF("a", "b"), localThreshold = threshold)
          .collect()
          .map(r => r.getLong(0) -> r.getLong(1))
          .toMap
        assert(got.keySet == expected.keySet, s"threshold=$threshold")
        val bad = got.filter { case (n, c) => expected(n) != c }
        assert(bad.isEmpty, s"threshold=$threshold mislabeled: ${bad.take(5)}")
      }
    } finally spark.stop()
  }
}
