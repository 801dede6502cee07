package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.PortableHash

/** The fused native MinHash+LSH kernel must be bit-identical to the
  * original two-step formulation (distinct string grams → PortableHash
  * signature → band fold) that the DuckDB oracle reproduces — including
  * duplicate-gram documents (min over a multiset = min over its support)
  * and the shorter-than-n edge. */
class MinhashBandKeysSpec extends AnyFunSuite {

  private def reference(words: Seq[String], n: Int,
                        numHashes: Int, bandRows: Int): Seq[Long] = {
    if (words.length < n) return Seq.empty
    val grams = words.sliding(n).map(_.mkString(" ")).toSeq.distinct
    PortableHash.bandKeys(
      PortableHash.minhashSignature(grams, numHashes).toSeq, bandRows)
  }

  private def kernel(words: Seq[String], n: Int,
                     numHashes: Int, bandRows: Int): Seq[Long] = {
    val in = new GenericArrayData(
      words.map(w => UTF8String.fromString(w): Any).toArray)
    val out = MinhashBandKeys.kernel(in, n, numHashes, bandRows)
    (0 until out.numElements()).map(out.getLong)
  }

  test("matches the string-gram + PortableHash reference on random words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh öü"
    for (trial <- 0 until 200) {
      val m = rnd.nextInt(12)
      val words = Seq.fill(m)(
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
          .replace(" ", "x"))
      val n = 1 + rnd.nextInt(3)
      val (nh, br) = Seq((64, 4), (32, 4), (8, 2))(rnd.nextInt(3))
      assert(kernel(words, n, nh, br) == reference(words, n, nh, br),
        s"trial $trial words=$words n=$n")
    }
  }

  test("duplicate grams do not change the signature") {
    val words = Seq("a", "b", "a", "b", "a", "b")
    assert(kernel(words, 2, 32, 4) == reference(words, 2, 32, 4))
  }

  test("shorter than n yields no band keys") {
    assert(kernel(Seq("only"), 2, 32, 4).isEmpty)
    assert(kernel(Seq.empty, 1, 32, 4).isEmpty)
  }
}
