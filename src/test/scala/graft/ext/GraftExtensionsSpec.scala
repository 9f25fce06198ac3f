package graft.ext

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL and matches the column API") {
    GraftExtensions.register(spark)
    val one = spark.sql(
      """SELECT cosine_sim(array(cast(0.6 as float), cast(0.8 as float)),
        |                  array(cast(0.6 as float), cast(0.8 as float))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-9)
    val ortho = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |                  array(cast(0.0 as float), cast(1.0 as float))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(ortho) < 1e-9)
  }

  test("cosine_sim works over a parquet table in SQL") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .createOrReplaceTempView("emb_ext_test")
    val bad = spark.sql(
      "SELECT count(*) FROM emb_ext_test WHERE abs(cosine_sim(embedding, embedding) - 1.0) > 1e-6")
      .head().getLong(0)
    assert(bad == 0, s"$bad self-similarities differ from 1.0")
  }
}
