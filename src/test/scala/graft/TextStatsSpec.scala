package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{functions => F}

import graft.pipeline.TextOps

/** The native `text_quality_stats` kernel must be BYTE-IDENTICAL to the
  * regex pipeline it replaces (r12 verdict task 2): same four integers,
  * same blended double, on unicode adversaries and the real corpus. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the regex semantics' sharp edges: unicode lowercasing that mints new
  // ascii letters (İ -> i + combining dot), astral code points, non-ASCII
  // whitespace (punct under the ASCII-only \s class), stopwords embedded
  // in longer tokens (no \b match), digit-glued stopwords, empty/null
  private val adversaries: Seq[String] = Seq(
    null,
    "",
    "   ",
    "the quick brown fox, AND IT was... fast!",
    "theory thesis otherwise android — the a an and",
    "a9 the9 9the the 9 a",
    "café naïve résumé",
    "漢字 text İstanbul İstanbul",
    "emoji 😀🎉 end",
    "tab\tand\nnewline\f\rws",
    "non breaking spaces",
    "UPPER lower MiXeD 123 456abc",
    "!!!???;;;:::(((...)))",
    "combining é acute å ring",
    "is it of to in on by at as or an be the that this with for and a")

  test("kernel stats equal the four regex operators on adversarial inputs") {
    val df = adversaries.toDF("text")
    graft.exprs.GraftFunctions.register(spark)
    val st = F.call_function("text_quality_stats", F.col("text"))
    val rows = df.select(
      st.getField("len").as("k_len"),
      st.getField("tokens").as("k_tok"),
      st.getField("stops").as("k_stop"),
      st.getField("punct").as("k_punct"),
      F.length(F.col("text")).as("r_len"),
      TextOps.tokenCount(F.col("text")).as("r_tok"),
      TextOps.stopwordCount(F.col("text")).as("r_stop"),
      TextOps.punctCount(F.col("text")).as("r_punct"),
      F.col("text")).collect()
    for (r <- rows) {
      assert(r.get(0) == r.get(4), s"len mismatch on '${r.get(8)}'")
      assert(r.get(1) == r.get(5), s"tokens mismatch on '${r.get(8)}'")
      assert(r.get(2) == r.get(6), s"stopwords mismatch on '${r.get(8)}'")
      assert(r.get(3) == r.get(7), s"punct mismatch on '${r.get(8)}'")
    }
  }

  test("qualityScore (kernel) is bit-identical to qualityScoreRegex") {
    val df = adversaries.toDF("text")
    val rows = df.select(
      TextOps.qualityScore(F.col("text")).as("k"),
      TextOps.qualityScoreRegex(F.col("text")).as("r")).collect()
    for (r <- rows)
      assert(Option(r.get(0)) == Option(r.get(1)), s"score mismatch: $r")
  }

  test("dup_ngram_stats kernel equals the tokenCount/shingle expression forms") {
    // r21: the fused repetition kernel must match the expression path it
    // replaces — token count AND both dup-fraction doubles, plus the raw
    // distinct n-gram counts against shingle_w where tokens >= n — on
    // the unicode adversaries and a repetition-heavy stripe
    val reps = Seq(
      "a a a a a a", "one two one two one two", "x y z x y z x y",
      "repeat repeat repeat repeat stop", "ab ab ba ab ab ba")
    val df = (adversaries ++ reps).toDF("text")
    val st = TextOps.dupNgramStats(F.col("text"))
    val rows = df.select(F.col("text"), st.as("__rs"))
      .select(
        F.col("__rs").getField("tokens").as("k_tok"),
        TextOps.dupNgramFractionFromStats(F.col("__rs"), 2).as("k_f2"),
        TextOps.dupNgramFractionFromStats(F.col("__rs"), 3).as("k_f3"),
        F.col("__rs").getField("d2").as("k_d2"),
        F.col("__rs").getField("d3").as("k_d3"),
        TextOps.tokenCount(F.col("text")).as("r_tok"),
        TextOps.dupNgramFraction(F.col("text"), 2).as("r_f2"),
        TextOps.dupNgramFraction(F.col("text"), 3).as("r_f3"),
        F.size(graft.pipeline.Dedup.shingles(F.col("text"), 2)).as("r_d2"),
        F.size(graft.pipeline.Dedup.shingles(F.col("text"), 3)).as("r_d3"),
        F.col("text")).collect()
    for (r <- rows) {
      assert(r.get(0) == r.get(5), s"tokens mismatch on '${r.get(10)}'")
      assert(Option(r.get(1)) == Option(r.get(6)), s"f2 mismatch on '${r.get(10)}'")
      assert(Option(r.get(2)) == Option(r.get(7)), s"f3 mismatch on '${r.get(10)}'")
      val tok = Option(r.get(0)).map(_.asInstanceOf[Int]).getOrElse(0)
      // shingle_w returns the 1-element whole-doc shingle below n tokens;
      // the kernel reports 0 there (the fraction guard never reads it)
      if (tok >= 2) assert(r.get(3) == r.get(8), s"d2 mismatch on '${r.get(10)}'")
      if (tok >= 3) assert(r.get(4) == r.get(9), s"d3 mismatch on '${r.get(10)}'")
    }
  }

  test("dup_ngram_stats kernel matches the expression forms on the documents corpus (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val st = TextOps.dupNgramStats(F.col("text"))
    val mismatches = docs
      .select(F.col("text"), st.as("__rs"))
      .select(
        F.col("__rs").getField("tokens").as("k_tok"),
        TextOps.dupNgramFractionFromStats(F.col("__rs"), 2).as("k_f2"),
        TextOps.dupNgramFractionFromStats(F.col("__rs"), 3).as("k_f3"),
        TextOps.tokenCount(F.col("text")).as("r_tok"),
        TextOps.dupNgramFraction(F.col("text"), 2).as("r_f2"),
        TextOps.dupNgramFraction(F.col("text"), 3).as("r_f3"))
      .filter(!(F.col("k_tok") <=> F.col("r_tok")) ||
        !(F.col("k_f2") <=> F.col("r_f2")) || !(F.col("k_f3") <=> F.col("r_f3")))
      .count()
    assert(mismatches == 0)
  }

  test("qualityScore kernel matches regex on the documents corpus (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatches = docs
      .select(TextOps.qualityScore(F.col("text")).as("k"),
        TextOps.qualityScoreRegex(F.col("text")).as("r"))
      .filter(!(F.col("k") <=> F.col("r")))
      .count()
    assert(mismatches == 0)
  }
}
