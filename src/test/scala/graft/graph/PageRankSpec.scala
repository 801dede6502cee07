package graft.graph

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** PageRank.ranks against a driver-side scalar reimplementation of the
  * same integer recurrence, plus the structural properties a centrality
  * ranking must satisfy (hub outranks leaves, mass conservation bound,
  * dangling nodes keep the teleport base). */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pagerank-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Scale = 1L << 20

  /** Same integer recurrence, sequentially: rank div outdeg per edge,
    * base + 85·Σ div 100 per node. */
  private def scalarRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = Scale * 15 / 100
    var r = nodes.map(_ -> Scale).toMap
    (1 to iters).foreach { _ =>
      val sums = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(n => n -> (base + 85 * sums.getOrElse(n, 0L) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the scalar integer reference exactly") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).distinct
      .filter { case (a, b) => a != b }
    assert(run(edges, 5) == scalarRanks(edges, 5))
  }

  test("hub outranks leaves; dangling sink holds teleport-fed mass") {
    // star: every leaf points at the hub; hub points at one sink only
    val leaves = (1L to 20L)
    val edges = leaves.map(_ -> 100L) ++ Seq(100L -> 200L)
    val got = run(edges, 4)
    assert(got(100L) > got(1L) * 10, s"hub ${got(100L)} vs leaf ${got(1L)}")
    // the sink (no out-edges) receives the hub's whole rank each round
    assert(got(200L) > got(1L), s"sink ${got(200L)} vs leaf ${got(1L)}")
    // leaves get exactly the teleport base (no in-edges)
    assert(got(1L) == Scale * 15 / 100)
    // integer mass never exceeds the initial total (damping + floor only
    // destroy mass; creation would mean an arithmetic bug)
    assert(got.values.sum <= Scale * got.size)
  }

  test("result is independent of input partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)).distinct
    val a = PageRank.ranks(edges.toDF("src", "dst").repartition(7), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == run(edges, 3))
  }
}
