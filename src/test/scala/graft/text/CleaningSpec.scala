package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("gopherStats: counts, mean word length, stop hits, short fraction") {
    val df = Seq("the cat sat on a mat").toDF("text")
      .select(Cleaning.gopherStats(split(col("text"), " ")).as("st"))
      .select("st.n_words", "st.mean_word_len", "st.stop_hits", "st.short_frac")
    val r = df.head()
    assert(r.getLong(0) == 6)
    assert(r.getDouble(1) == math.floor(15.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(r.getLong(2) == 2)  // the, a
    assert(r.getDouble(3) == math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6) // on, a
  }

  test("gopherPass applies every rule on the rounded stats") {
    val pass = Seq(
      "the quick brown foxes jumped over a lazy dogs fence today",  // passes
      "a b",                                                        // too short
      "the the the the the the the the the the the the the the the the the the the the aaaaaaaaaaaa") // mwl < 4
      .toDF("text")
      .select(Cleaning.gopherPass(Cleaning.gopherStats(split(col("text"), " ")),
        minWords = 5, maxWords = 90, minMwl = 4.0, maxMwl = 5.0,
        minStopHits = 2, maxShortFrac = 0.25).as("p"))
      .as[Boolean].collect().toSeq
    assert(pass === Seq(true, false, false))
  }

  test("c4KeepLines: ≥ minWords AND terminal period") {
    val kept = Seq(Array(
      "one two three four five.",  // kept
      "one two three four five",   // no period
      "short line.",               // too few words
      "six seven eight nine ten eleven.")) // kept
      .toDF("lines")
      .select(Cleaning.c4KeepLines(col("lines"), 5).as("k"))
      .as[Seq[String]].head()
    assert(kept === Seq("one two three four five.",
      "six seven eight nine ten eleven."))
  }

  test("firstOccurrence: corpus-wide first (id, pos) wins; later dupes flagged") {
    val lines = Seq(
      (1L, 0L, "alpha"), (1L, 1L, "beta"),
      (2L, 0L, "alpha"),            // dupe of (1,0)
      (2L, 1L, "gamma"),
      (1L, 2L, "alpha")             // intra-doc dupe of (1,0)
    ).toDF("doc_id", "pos", "line")
    val kept = Cleaning.firstOccurrence(lines, "doc_id", "pos", "line")
      .filter(col("kept")).select("doc_id", "pos")
      .as[(Long, Long)].collect().toSet
    assert(kept === Set((1L, 0L), (1L, 1L), (2L, 1L)))
  }
}
