package graft.pipeline

import graft.SparkSpec
import graft.scale.PrefixSum
import graft.text.Pii
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("pii: counts and redaction on crafted text") {
    import spark.implicits._
    val df = Seq(
      "mail a@b.com and c.d-e@f.co.uk now",
      "call +1-555-0042 or +1-555-9999",
      "hosts 10.0.0.1 and 192.168.1.255",
      "clean text with no pii at all").toDF("text")
    val r = df.select(
      Pii.countEmails(col("text")).as("e"),
      Pii.countPhones(col("text")).as("p"),
      Pii.countIpv4s(col("text")).as("i"),
      Pii.redact(col("text")).as("red")).collect()
    assert(r(0).getInt(0) == 2 && r(0).getString(3) == "mail [EMAIL] and [EMAIL] now")
    assert(r(1).getInt(1) == 2 && r(1).getString(3) == "call [PHONE] or [PHONE]")
    assert(r(2).getInt(2) == 2 && r(2).getString(3) == "hosts [IP] and [IP]")
    assert(r(3) == org.apache.spark.sql.Row(0, 0, 0, "clean text with no pii at all"))
  }

  test("pii: redaction order keeps email hosts out of the ip pattern") {
    import spark.implicits._
    // the host contains a dotted numeric run; email redaction must win
    val red = Seq("x user1@mail42.example.com y").toDF("text")
      .select(Pii.redact(col("text"))).head().getString(0)
    assert(red == "x [EMAIL] y")
  }

  test("hash split: deterministic, exhaustive, and roughly stratified") {
    import spark.implicits._
    val df = spark.range(4000).toDF("id")
    val split = df.select(col("id"), Sampling.hashSplit(col("id"), 13).as("s"))
    val again = df.select(col("id"), Sampling.hashSplit(col("id"), 13).as("s"))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
    val counts = split.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val"))
    val frac = counts("train").toDouble / 4000
    assert(math.abs(frac - 13.0 / 16) < 0.03, s"train fraction $frac")
  }

  test("prefix sum matches the single-window ground truth across buckets") {
    import spark.implicits._
    // keys with gaps so buckets are uneven; values vary
    val rows = (0L until 1000L).map(i => (i * 3, (i % 7) + 1)).toDF("k", "v")
    val dist = PrefixSum.withCumSum(rows, "k", "v", "cum", bucketSize = 64)
    import org.apache.spark.sql.expressions.Window
    val truth = rows.withColumn("cum",
      sum(col("v")).over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    assert(dist.select("k", "v", "cum").except(truth).isEmpty)
    assert(truth.except(dist.select("k", "v", "cum")).isEmpty)
    // scale shape: the only UNpartitioned window runs over the per-bucket
    // totals (bucketSize× smaller than the input); the full-input window
    // is partitioned by bucket, so no window partition exceeds bucketSize
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // root whose collect() doesn't descend into the live plan
    val windows = dist.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.output.map(_.name).contains("_psum_total"),
        s"unpartitioned window over the full input: $w")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty))
  }

  test("mixture keep: hex thresholds and per-source fractions") {
    import spark.implicits._
    assert(Sampling.hexThreshold(0.0) == "0000")
    assert(Sampling.hexThreshold(1.0) == "g") // above every hex prefix
    assert(Sampling.hexThreshold(0.5) == "8000")
    assert(Sampling.hexThreshold(0.8) == "cccc")
    val df = spark.range(8000)
      .select(col("id"), concat(lit("s"), (col("id") % 2).cast("string")).as("src"))
    val kept = df.filter(Sampling.mixtureKeep(col("id"), col("src"),
      Map("s0" -> 0.75, "s1" -> 0.25), defaultFraction = 0.0))
    val by = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(by("s0") / 4000.0 - 0.75) < 0.03, by.toString)
    assert(math.abs(by("s1") / 4000.0 - 0.25) < 0.03, by.toString)
    // unknown source with default 0.0 keeps nothing
    val none = df.withColumn("src", lit("zz")).filter(
      Sampling.mixtureKeep(col("id"), col("src"), Map("s0" -> 1.0), 0.0))
    assert(none.count() == 0)
  }

  test("dup n-gram fraction: repeats, unique, and short docs") {
    import spark.implicits._
    import graft.text.TextOps
    def frac(t: String): Double = Seq(t).toDF("text")
      .select(TextOps.dupNgramFrac(col("text"), 2)).head().getDouble(0)
    assert(frac("a b a b a b") == 1.0 - 2.0 / 5) // bigrams: ab,ba,ab,ba,ab
    assert(frac("a b c d") == 0.0)               // all distinct
    assert(frac("a b") == 0.0)                   // single bigram
    assert(frac("a") == 0.0)                     // no bigram
    assert(frac("") == 0.0)
  }

  test("budget sample keeps a prefix and respects the budget") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, 10L)).toDF("k", "w")
    val kept = Sampling.budgetSample(rows, "k", "w", lit(1000L), bucketSize = 32)
    assert(kept.count() == 100) // 100 rows × weight 10 = exactly the budget
    assert(kept.agg(max("k")).head().getLong(0) == 99L) // a prefix, not a sample
  }

  test("fraction budget sample: lazy construction, correct cut") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i, 5L)).toDF("k", "w")
    val kept = Sampling.budgetSampleFraction(rows, "k", "w", 0.25, bucketSize = 64)
    // total weight 2000, budget 500 -> first 100 rows
    assert(kept.count() == 100)
    assert(kept.agg(max("k")).head().getLong(0) == 99L)
    // construction must not run a job: the plan carries a broadcast join
    // of the budget scalar rather than a precomputed literal
    val plan = kept.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"budget scalar not joined lazily:\n$plan")
  }

  test("temperature quotas: sqrt weighting flattens a skewed mixture") {
    import spark.implicits._
    // 900 docs of 'big', 100 of 'small': proportional sampling gives 9:1,
    // sqrt-temperature gives 30:10 = 3:1
    val docs = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val r = Sampling.temperatureQuotas(docs, "doc_id", "source", totalTarget = 100L)
      .orderBy("source").collect()
    val big = r(0); val small = r(1)
    assert(big.getAs[Long]("weight") == 30 && small.getAs[Long]("weight") == 10)
    assert(big.getAs[Long]("quota") == 75 && small.getAs[Long]("quota") == 25)
    // small source is upsampled: quota/n_docs 25% vs big's 8.3%
    val keptBig = big.getAs[Long]("n_kept").toDouble / 900
    val keptSmall = small.getAs[Long]("n_kept").toDouble / 100
    assert(keptSmall > keptBig * 2, s"small $keptSmall vs big $keptBig")
  }

  test("temperature quotas: a tiny source with quota >= count keeps all") {
    import spark.implicits._
    val docs = ((0L until 1000L).map(i => (i, "big")) ++
      Seq((1000L, "tiny"), (1001L, "tiny"))).toDF("doc_id", "source")
    val r = Sampling.temperatureQuotas(docs, "doc_id", "source", totalTarget = 200L)
      .orderBy("source").collect()
    val tiny = r(1)
    assert(tiny.getAs[String]("threshold_hex") == "g")
    assert(tiny.getAs[Long]("n_kept") == 2)
  }

  test("shuffle shard: balanced shards, contiguous seqs, append-stable") {
    import spark.implicits._
    val docs = spark.range(800).toDF("doc_id")
    val r = Sampling.shuffleShard(docs, col("doc_id"), nShards = 8)
    val perShard = r.groupBy("shard").agg(
      count(lit(1)).as("n"), min("seq").as("lo"), max("seq").as("hi")).collect()
    assert(perShard.length == 8)
    perShard.foreach { s =>
      assert(s.getAs[Long]("lo") == 1L && s.getAs[Long]("hi") == s.getAs[Long]("n"))
      assert(math.abs(s.getAs[Long]("n") - 100.0) < 40, s"skewed shard: $s")
    }
    // shard assignment is content-addressed: appending new docs never
    // moves an existing one
    val grown = Sampling.shuffleShard(spark.range(1600).toDF("doc_id"),
      col("doc_id"), nShards = 8).filter(col("doc_id") < 800)
    val before = r.select("doc_id", "shard").collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    grown.select("doc_id", "shard").collect().foreach { x =>
      assert(before(x.getLong(0)) == x.getInt(1))
    }
  }

  test("weightedTopK: heavier rows are sampled proportionally more often") {
    import spark.implicits._
    // 500 light rows (w=1) vs 500 heavy rows (w=10): a weighted sample of
    // 100 should skew hard toward the heavy half (E[heavy] ≈ 91)
    val df = (0 until 1000).map(i => (i.toLong, if (i < 500) 1.0 else 10.0))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedTopK(df, col("doc_id"), "w", k = 100)
      .select("doc_id").as[Long].collect()
    val heavy = kept.count(_ >= 500)
    assert(kept.length == 100)
    assert(heavy > 75, s"heavy rows under-sampled: $heavy/100")
  }

  test("stratifiedTopN keeps exactly n hash-smallest rows per stratum") {
    import spark.implicits._
    val df = (0 until 600).map(i => (i.toLong, s"s${i % 3}")).toDF("k", "stratum")
    val kept = Sampling.stratifiedTopN(df, col("stratum"), col("k"), n = 25)
    assert(kept.count() == 75)
    assert(kept.groupBy("stratum").count().as[(String, Long)].collect()
      .forall(_._2 == 25L))
    // deterministic + stable under growth: the original picks survive
    // unless displaced by hash order, never by row order
    val before = kept.select("k").as[Long].collect().toSet
    val grown = df.union(Seq((1000L, "s0")).toDF("k", "stratum"))
    val after = Sampling.stratifiedTopN(grown, col("stratum"), col("k"), 25)
      .select("k").as[Long].collect().toSet
    assert((before -- after).size <= 1)
    // plan check: the rank filter must compile to a WindowGroupLimit
    // (partial top-n before the shuffle), not a full per-stratum sort
    val plan = Sampling.stratifiedTopN(df, col("stratum"), col("k"), 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }

  test("weightedTopK is deterministic and content-addressed") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, 1.0 + i % 7)).toDF("doc_id", "w")
    val a = Sampling.weightedTopK(df, col("doc_id"), "w", 40).select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedTopK(df, col("doc_id"), "w", 40).select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // plan check: global top-k must be a TakeOrdered, not a full sort
    val plan = Sampling.weightedTopK(df, col("doc_id"), "w", 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }
}
