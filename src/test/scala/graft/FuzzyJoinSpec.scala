package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

/** Fuzzy dictionary matching: closed-form pairs, lossless length-band
  * blocking vs a naive driver replay, and the distinct-dictionary
  * contract. */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(names: Seq[String], k: Int): Set[(String, String, Int)] =
    FuzzyJoin.dictionaryMatches(names.toDF("name"), "name", k)
      .as[(String, String, Int)].collect().toSet

  test("closed-form pairs, duplicates collapse, out-of-band lengths never verify") {
    val got = run(Seq("cat", "bat", "catt", "dog", "cat", "dogfish"), 1)
    assert(got == Set(("bat", "cat", 1), ("cat", "catt", 1)))
  }

  test("blocking is lossless: equals the naive all-pairs replay on random strings") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(7000 + seed)
      val names = List.fill(60)(
        List.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(4)).toChar).mkString).distinct
      val k = 1 + rnd.nextInt(2)
      val got = run(names, k)
      val expected = (for {
        a <- names; b <- names if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d)).toSet
      assert(got == expected, s"seed=$seed k=$k")
    }
  }

  test("maxDist 0 over a distinct dictionary is empty") {
    assert(run(Seq("x", "y", "x"), 0).isEmpty)
  }
}
