package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** The native n-gram hash kernel against a straightforward Scala reference
  * implementation, over seeded-random word arrays and the edge shapes
  * (shorter than n, exact n, repeated grams, empty words array). */
class NgramHashesSpec extends AnyFunSuite {

  private def reference(words: Seq[String], n: Int): Seq[Long] = {
    if (words.length < n) return Seq.empty
    val wh = words.map { w =>
      val u = UTF8String.fromString(w)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }
    wh.sliding(n).map { g =>
      g.foldLeft(0L)((h, x) =>
        java.lang.Long.rotateLeft(h * 0x9E3779B185EBCA87L + x, 27))
    }.toSeq.distinct.sorted
  }

  private def kernel(words: Seq[String], n: Int): Seq[Long] =
    NgramHashes.kernel(
      new GenericArrayData(words.map(UTF8String.fromString).toArray[Any]), n)
      .toLongArray().toSeq

  test("kernel matches the reference on seeded-random word arrays") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "bb", "ccc", "käse", "x1", "", "longerword", "y")
    for (trial <- 0 until 500) {
      val len = rnd.nextInt(12)
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).map {
        // the engine filters empty words before the kernel; do the same
        w => if (w.isEmpty) "e" else w
      }
      val n = 1 + rnd.nextInt(4)
      assert(kernel(words, n) === reference(words, n),
        s"trial $trial words=$words n=$n")
    }
  }

  test("edge shapes: short, exact-n, all-repeated, empty") {
    assert(kernel(Seq("a", "b"), 3) === Seq.empty)
    assert(kernel(Seq.empty, 2) === Seq.empty)
    assert(kernel(Seq("a", "b", "c"), 3).length === 1)
    // "x x x x" has one distinct 2-gram
    assert(kernel(Seq("x", "x", "x", "x"), 2).length === 1)
    // order matters: (a,b) != (b,a)
    assert(kernel(Seq("a", "b"), 2) !== kernel(Seq("b", "a"), 2))
  }
}
