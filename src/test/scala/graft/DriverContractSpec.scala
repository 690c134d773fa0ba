package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the exact path the round driver runs: the Verify dump at the
  * smallest scale factor, then validates its artifacts — every query wrote
  * a parquet dir and oracle_sql.json is parseable JSON covering every
  * oracle entry. */
class DriverContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Verify.run writes every query result and a valid oracle_sql.json") {
    val out = Files.createTempDirectory("verify_ci").toString
    Verify.run(spark, "/root/testdata/sf0.001", out)

    for (name <- SparkEntry.queries.keys) {
      assert(Files.isDirectory(Paths.get(s"$out/$name")), s"$name parquet missing")
      assert(Files.list(Paths.get(s"$out/$name")).anyMatch(_.toString.endsWith(".parquet")),
        s"$name wrote no parquet part")
    }

    val json = new ObjectMapper().readTree(Files.readString(Paths.get(s"$out/oracle_sql.json")))
    assert(json.isObject)
    val keys = {
      val it = json.fieldNames(); val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(keys == SparkEntry.oracleSql.keySet)
    // every oracle string survived escaping intact
    for (k <- SparkEntry.oracleSql.keys)
      assert(json.get(k).asText() == SparkEntry.oracleSql(k))
  }
}
