package graft

import graft.pipeline.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark
  import spark.implicits._

  test("salted join equals plain join on skewed keys") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i))
      .toDF("k", "v") // 90% of rows share one key
    val small = Seq(("HOT", "hot-payload"), ("cold10", "c10")).toDF("k", "p")
    val plain = large.join(small, Seq("k")).agg(count(lit(1)), sum("v")).head
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltFactor = 8)
      .agg(count(lit(1)), sum("v")).head
    assert(plain == salted)
  }

  test("salted count equals plain count") {
    val df = (1 to 500).map(i => ("k" + (i % 3), i)).toDF("k", "v")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k"), saltFactor = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }
}
