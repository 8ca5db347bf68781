package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.core._
import graft.io.TadaIO

/** The reference's signature acceptance test: the README pipeline
  * (readme_test.go:12-59) — messy CSV in, filtered group means out,
  * compared as stringified records. */
class ReadmePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val csv =
    """name, score
      |joe doe,
      |john doe, -100
      |jane doe, 1000
      |john doe, 6
      |jane doe, 8
      |john doe, 4
      |jane doe, 10""".stripMargin

  test("README pipeline: csv -> dropNull -> cast -> filter -> sort -> groupBy.mean") {
    val f0 = TadaIO.readCsvString(spark, csv)
    assert(f0.hasCols("name", "score"))
    val result = f0
      .dropNull("score")
      .withCol("score", f0.df("score").cast("double"))
      .filter(Map("score" -> ((c: org.apache.spark.sql.Column) => c >= 0 && c <= 10)))
      .sort(Sorter("name"))
      .groupBy("name")
      .mean("score")
    val got = result.records()
    val want = Seq(
      Seq("name", "mean_score"),
      Seq("jane doe", "9"),
      Seq("john doe", "5"))
    assert(TadaIO.diffRecords(got, want).isEmpty, s"got=$got")
  }

  import ReadmePipelineSpec.Out
  test("typed output (StructWriter form, readme_test.go:61-95)") {
    val f0 = TadaIO.readCsvString(spark, csv)
    val result = f0
      .dropNull("score")
      .withCol("score", f0.df("score").cast("double"))
      .filter(Map("score" -> ((c: org.apache.spark.sql.Column) => c >= 0 && c <= 10)))
      .sort(Sorter("name"))
      .groupBy("name")
      .mean("score")
    import spark.implicits._
    val typed = TadaIO.writeCaseClass[Out](result)
    assert(typed == Seq(Out("jane doe", 9.0), Out("john doe", 5.0)))
  }
}

object ReadmePipelineSpec {
  final case class Out(name: String, mean_score: Double)
}
