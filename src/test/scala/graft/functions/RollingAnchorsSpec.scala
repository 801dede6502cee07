package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** RollingAnchors kernel vs the naive per-position poly31 hash — the
  * rolling recurrence must select exactly the positions the direct
  * gram hash selects, on random strings, multi-byte text, and the
  * short-text/stride-1 edges. */
class RollingAnchorsSpec extends AnyFunSuite {

  private val M = graft.pipeline.PortableHash.M

  private def naive(t: String, k: Int, stride: Int): Seq[Int] = {
    val cps = t.codePoints().toArray
    (0 to cps.length - k).filter { p =>
      var h = 0L
      (0 until k).foreach(j => h = (h * 31 + cps(p + j)) % M)
      h % stride == 0
    }
  }

  private def kernel(t: String, k: Int, stride: Int): Seq[Int] =
    RollingAnchors.kernel(UTF8String.fromString(t), k, stride)
      .toIntArray().toSeq

  test("rolling recurrence equals the direct hash on random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val t = (1 to n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val k = 1 + rnd.nextInt(20)
      val stride = 1 + rnd.nextInt(8)
      assert(kernel(t, k, stride) == naive(t, k, stride),
        s"n=$n k=$k stride=$stride")
    }
  }

  test("code-point semantics: multi-byte and astral characters") {
    // é (2 UTF-8 bytes), € (3), 𝄞 (4, astral — 2 UTF-16 units): positions
    // must count CODE POINTS, matching Spark substring and DuckDB substr
    val t = "abé€𝄞xyé€𝄞ab"
    (1 to 5).foreach { k =>
      assert(kernel(t, k, 2) == naive(t, k, 2), s"k=$k")
      assert(kernel(t, k, 1) == (0 to t.codePointCount(0, t.length) - k),
        s"stride 1 selects every position, k=$k")
    }
  }

  test("edges: text shorter than k is anchorless; stride 1 selects all") {
    assert(kernel("ab", 8, 1).isEmpty)
    assert(kernel("abcdefgh", 8, 1) == Seq(0))
    assert(kernel("", 4, 1).isEmpty)
  }
}
