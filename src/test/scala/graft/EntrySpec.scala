package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry returns rows on sf0.001. */
class EntrySpec extends AnyFunSuite with SparkTest {
  test("SparkEntry.entry produces rows on the sf0.001 corpus") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
