package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force truth: all unordered pairs within maxDist. */
  private def truth(xs: Seq[String], maxDist: Int): Set[(String, String, Int)] =
    (for {
      a <- xs; b <- xs if a < b
      d = levenshteinDist(a, b) if d <= maxDist
    } yield (a, b, d)).toSet

  private def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def run(xs: Seq[String], maxDist: Int): Set[(String, String, Int)] =
    FuzzyJoin.selfJoin(xs.toDF("s"), "s", maxDist)
      .as[(String, String, Int)].collect().toSet

  test("exact recall incl. insert/delete shifts (the PassJoin shift window)") {
    // prefix inserts shift every segment — the case positional blocking misses
    val xs = Seq("abc", "xabc", "abcx", "abdc", "adc", "bc", "abc?", "zzzz",
      "query", "quern", "quer", "xquery", "uery")
    for (d <- 1 to 2)
      assert(run(xs, d) === truth(xs, d), s"maxDist=$d")
  }

  test("substitution-heavy set, maxDist 2") {
    val xs = Seq("customer01", "customer02", "customer12", "customer99",
      "custxmer01", "cusABmer01", "completely-different")
    assert(run(xs, 2) === truth(xs, 2))
  }

  test("no false positives: verification gate holds") {
    val out = run(Seq("aaaa", "bbbb", "cccc"), 1)
    assert(out.isEmpty)
  }

  test("duplicates collapse and empty strings are ignored") {
    val out = FuzzyJoin.selfJoin(Seq("ab", "ab", "", "ac").toDF("s"), "s", 1)
      .as[(String, String, Int)].collect().toSet
    assert(out === Set(("ab", "ac", 1)))
  }
}
