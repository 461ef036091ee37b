package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {

  test("counts and lift match a brute-force computation") {
    import spark.implicits._
    val texts = Seq.tabulate(20) { i =>
      if (i % 2 == 0) "new york is a big city in new york state"
      else "the big dog runs in new york every day"
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // brute force over the same tokenization
    val grams = texts.flatMap(t => t.split(" ").sliding(2).map(a => (a(0), a(1))))
    val cAb = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cA = grams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cB = grams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = grams.size.toDouble
    val expect = cAb.filter(_._2 >= 5).map { case (p, c) =>
      p -> (c, cA(p._1), cB(p._2),
        math.floor(c * n / (cA(p._1) * cB(p._2)) * 1e6 + 0.5) / 1e6)
    }

    val got = Collocations.mine(docs, "text", minCount = 5)
      .collect().map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
         r.getAs[Double]("lift")))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (p, e) => assert(got(p) == e, s"pair $p") }
    // sanity: the deterministic "new york" pair has lift > 1 (positive association)
    assert(got(("new", "york"))._4 > 1.0)
  }

  test("minCount filters rare pairs before the joins") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d"), (1L, "a b x y")).toDF("doc_id", "text")
    val out = Collocations.mine(docs, "text", minCount = 2).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("a", "b")))
  }
}
