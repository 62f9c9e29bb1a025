package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpecBase.spark

  test("registered functions work through spark.sql") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("""{"a":1,"b":[2,3]}""", "x y z x")).toDF("js", "txt")
      .createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT json_get(js, 'a') AS a,
                json_flatten(js)['b'] AS b,
                simhash64(split(txt, ' ')) AS sh,
                size(word_shingles(split(txt, ' '), 2)) AS nsh,
                size(minhash_sig(word_shingles(split(txt, ' '), 2), 16)) AS nsig,
                vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
                vec_norm(array(3.0d, 4.0d)) AS nrm,
                vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
                size(rhp_buckets(array(1.0d, 0.0d), 4, 8)) AS nbk,
                fuzzy_token_match(txt, 'xz', 1) AS fz
         FROM t""").head
    assert(row.getString(0) == "1")
    assert(row.getSeq[String](1) == Seq("2", "3"))
    assert(row.getLong(2) != 0L)
    assert(row.getInt(3) == 3) // "x y","y z","z x" distinct
    assert(row.getInt(4) == 16)
    assert(row.getDouble(5) == 11.0)
    assert(row.getDouble(6) == 5.0)
    assert(row.getDouble(7) == 1.0)
    assert(row.getInt(8) == 4)
    assert(row.getBoolean(9)) // 'x' within 1 edit of 'xz'
  }

  test("vector kernels accept empty untyped arrays; reject null-typed elements") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(), array()) d, vec_norm(array()) n").head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("extensions class injects into a fresh session builder") {
    // session already exists; withExtensions path is exercised via the
    // class's apply contract on a fresh SparkSessionExtensions
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
