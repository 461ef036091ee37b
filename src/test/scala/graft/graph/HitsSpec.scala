package graft.graph

import graft.SparkSpec

class HitsSpec extends SparkSpec {

  test("exact-integer HITS matches hand-computed scores on a small graph") {
    import spark.implicits._
    // hub page h points at both authorities x and y; page p points at x only
    val edges = Seq(("h", "x"), ("h", "y"), ("p", "x")).toDF("src", "dst")
    val out = Hits.run(edges, iterations = 2)
      .collect().map(r => r.getAs[String]("node") ->
        (r.getAs[Long]("hub_raw"), r.getAs[Long]("auth_raw"))).toMap
    // i1: auth(x)=2 (h,p), auth(y)=1; hub(h)=auth(x)+auth(y)=3, hub(p)=2
    // i2: auth(x)=hub(h)+hub(p)=5, auth(y)=hub(h)=3; hub(h)=8, hub(p)=5
    assert(out("x") == ((0L, 5L)))
    assert(out("y") == ((0L, 3L)))
    assert(out("h") == ((8L, 0L)))
    assert(out("p") == ((5L, 0L)))
  }

  test("shares are L1-normalized") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val out = Hits.run(edges, iterations = 1).collect()
    assert(math.abs(out.map(_.getAs[Double]("hub_share")).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getAs[Double]("auth_share")).sum - 1.0) < 1e-9)
  }

  test("parallel edges collapse") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "b"), ("c", "b")).toDF("src", "dst")
    val out = Hits.run(edges, iterations = 1)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Long]("auth_raw")).toMap
    assert(out("b") == 2L) // not 3: the duplicate a->b counts once
  }
}
