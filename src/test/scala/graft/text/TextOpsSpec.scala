package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("tokenCount counts whitespace tokens; empty is 0") {
    val df = Seq("a b  c", "  ", "", "single", "a\tb\nc d").toDF("text")
    val got = df.select(TextOps.tokenCount(col("text"))).as[Long].collect().toSeq
    assert(got == Seq(3L, 0L, 0L, 1L, 4L))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq("Hello  World", "hello world", "hello  world ").toDF("text")
    val fps = df.select(TextOps.fingerprint(col("text"))).as[String].collect().toSet
    assert(fps.size == 1)
  }

  test("chunkId matches reference format chunk_ + md5[:8]") {
    val df = Seq("abc").toDF("c")
    val id = one[String](df.select(TextOps.chunkId(col("c"))))
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    assert(id == "chunk_90015098")
  }

  test("langId detects CJK and stopword-voted languages") {
    val df = Seq(
      "这是一个中文文档，包含很多汉字内容。",
      "the cat and the dog is with the bird of prey",
      "der hund und die katze ist mit dem vogel",
      "le chat et la souris des les maisons",
      "el gato que los perros con para casa").toDF("text")
    val got = df.select(TextOps.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("zh", "en", "de", "fr", "es"))
  }

  test("qualityScore in [0,1] and penalizes junk") {
    val good = "this is a reasonably long sentence with normal words and structure here now ok fine more words again longer"
    val junk = "!!! ??? ... 12345 67890 $$$ %%%"
    val df = Seq(good, junk).toDF("text")
    val s = df.select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(0) > s(1))
  }
}
