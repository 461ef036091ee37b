package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches brute-force pairs within the window inside each block") {
    import spark.implicits._
    val recs = Seq(
      (1L, "smith john"), (2L, "smith jon"), (3L, "smith joan"),
      (4L, "smyth john"), (5L, "taylor ann"), (6L, "taylor anne"),
      (7L, "taylor bob"), (8L, "zeta one")
    ).toDF("id", "name")
    val w = 3
    val got = SortedNeighborhood.candidates(recs, "id", "name",
        prefixLen = 2, window = w, maxDist = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

    // brute force: same 2-char block, within w-1 positions under (key, id) order
    val rows = recs.collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = rows.groupBy(_._2.take(2)).values.flatMap { blk =>
      val sorted = blk.sortBy(t => (t._2, t._1))
      for {
        i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.length)
        if lev(sorted(i)._2, sorted(j)._2) <= 2
      } yield (sorted(i)._1, sorted(j)._1)
    }.toSet
    assert(got == expect)
    assert(got.contains((1L, 2L))) // john/jon inside the smith block
    assert(!got.exists(p => p._1 == 8L || p._2 == 8L)) // zeta alone in its block
  }

  test("dist column is the verified Levenshtein distance") {
    import spark.implicits._
    val recs = Seq((1L, "abcd"), (2L, "abce"), (3L, "abXX")).toDF("id", "name")
    val out = SortedNeighborhood.candidates(recs, "id", "name", 2, 3, 2)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")), r.getAs[Long]("dist"))).toMap
    // sort order inside the "ab" block is abXX(3) < abcd(1) < abce(2)
    assert(out((1L, 2L)) == 1L)
    assert(out((3L, 1L)) == 2L)
    assert(out((3L, 2L)) == 2L)
  }
}
