package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (sbt forks one test JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = graft.util.Sessions.local(4, "graft-test")
}

trait SparkTest {
  implicit lazy val spark: SparkSession = SparkTestBase.spark
}
