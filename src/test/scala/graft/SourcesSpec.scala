package graft

import graft.sources.SeedTable
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("S1: seed-table roundtrip in R-compatible whitespace format") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-seed")
    val file = tmp.resolve("seed.txt")
    // the reference's format: quoted header, space-delimited doubles
    java.nio.file.Files.writeString(file,
      "\"seed1\" \"seed2\"\n0.1 0.9\n0.25 0.75\n123.5 42.0\n")
    val df = SeedTable.read(spark, file.toString)
    assert(df.columns.toSeq == Seq("seed1", "seed2"))
    val rows = df.orderBy("seed1").collect()
    assert(rows.length == 3)
    assertNear(rows(0).getDouble(0), 0.1)
    assertNear(rows(2).getDouble(1), 42.0)

    val out = tmp.resolve("out").toString
    SeedTable.write(df, out)
    val back = SeedTable.read(spark, out)
    assert(back.count() == 3)
  }
}
