package graft.operators

import graft.SparkSpec

class SubsetSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((10, 100, 1000), (11, 101, 1001))
    .toDF("col1", "col2", "col3")

  // cases mirror erde/op/subset.py doctest
  test("rename keeps only listed columns") {
    assert(Subset(df, "col1: col4").columns.toSeq == Seq("col4"))
  }
  test("rename with star keeps the rest") {
    assert(Subset(df, "col1: col5,*").columns.toSeq == Seq("col5", "col2", "col3"))
  }
  test("drop only implies star") {
    assert(Subset(df, "-col1").columns.toSeq == Seq("col2", "col3"))
  }
  test("rename plus drop") {
    assert(Subset(df, "col2:new2, -col1").columns.toSeq == Seq("new2"))
  }
  test("missing kept column raises") {
    intercept[IllegalArgumentException](Subset(df, "nope"))
  }
  test("dropped missing column is ignored") {
    assert(Subset(df, "-nope").columns.toSeq == Seq("col1", "col2", "col3"))
  }
  test("rename of removed column raises") {
    intercept[IllegalArgumentException](Subset(df, "-col1:col2"))
  }
  test("rows are preserved") {
    assert(Subset(df, "col1: col4,*").count() == 2)
  }
}
