package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Names the Spark jobs an eager pipeline action launches, so job-level
  * profiles (Spark UI, Bench's GRAFT_KG_JOBS listener) attribute wall
  * time to pipeline stages instead of anonymous job ids. */
object Jobs {
  def named[A](spark: SparkSession, description: String)(f: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(description)
    try f finally sc.setJobDescription(prev) // restore enclosing scope's label
  }
}
