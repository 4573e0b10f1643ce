package graft.kernels

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ShinglerSpec extends AnyFunSuite with Matchers {

  test("normalize lowercases, collapses whitespace, trims") {
    Shingler.normalize("  Hello\t\nWORLD  x ") shouldBe "hello world x"
    Shingler.normalize("") shouldBe ""
    Shingler.normalize(null) shouldBe ""
    Shingler.normalize(" \n\t ") shouldBe ""
  }

  test("shingle sets are sorted, distinct, deterministic (sort-on-write ≙ VectorMapper.scala:31)") {
    val s = Shingler.shingles("the quick brown fox jumps over the lazy dog the quick brown", 3, Shingler.Words)
    s shouldBe s.sorted
    s.distinct.length shouldBe s.length
    s shouldBe Shingler.shingles("the quick brown fox jumps over the lazy dog the quick brown", 3, Shingler.Words)
  }

  test("whitespace/case noise does not change the shingle set") {
    val a = Shingler.shingles("The  Quick\tBrown Fox", 2, Shingler.Words)
    val b = Shingler.shingles("the quick brown   fox ", 2, Shingler.Words)
    a shouldBe b
  }

  test("word mode: n tokens → n-k+1 shingles when all distinct") {
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    Shingler.shingles(text, 3, Shingler.Words).length shouldBe 8
  }

  test("char mode: window count and k sensitivity") {
    Shingler.shingles("abcdef", 3, Shingler.Chars).length shouldBe 4
    Shingler.shingles("ab", 3, Shingler.Chars) shouldBe Array.empty[Long]
    Shingler.shingles("", 5, Shingler.Chars) shouldBe Array.empty[Long]
  }

  test("too-short word text → empty set (empty-doc sentinel path)") {
    Shingler.shingles("one two", 3, Shingler.Words) shouldBe Array.empty[Long]
  }

  test("different texts give (near-certainly) different sets; jaccard of edited text is high") {
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val edited = (1 to 100).map(i => if (i == 50) "CHANGED" else s"w$i").mkString(" ")
    val a = Shingler.shingles(base, 3, Shingler.Words)
    val b = Shingler.shingles(edited, 3, Shingler.Words)
    val j = ExactSim.jaccard(a, b)
    j should be > 0.85
    j should be < 1.0
  }
}
