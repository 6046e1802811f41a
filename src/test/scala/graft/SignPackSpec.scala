package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** SignPack (native packed sign signature) against its declarative
  * executable spec (32 graft_dot sum-of-when terms) — same discipline as
  * DotProductSpec / Md5Prefix60Spec: the custom expression must be
  * bit-identical to the formulation the DuckDB oracles mirror.
  */
class SignPackSpec extends SparkSpec {
  import spark.implicits._

  test("SignPack equals the declarative 32-term formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, (0 until 65).map(_ => rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val fam = SimilarityQueries.augPlaneFamily _
    val got = df.select(col("id"),
        SimilarityQueries.mipsSigDecl(fam, 0)(col("v")).as("d0"),
        SimilarityQueries.mipsSigDecl(fam, 1)(col("v")).as("d1"))
      .join(df.select(col("id"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.SignPack(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
            (0 until 32).map(j => fam(j)))).as("n0"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.SignPack(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")),
            (32 until 64).map(j => fam(j)))).as("n1")), "id")
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"half0 mismatch id=${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(4), s"half1 mismatch id=${r.getLong(0)}")
    }
    assert(got.length == 50)
  }

  test("SignPack null contract: length mismatch and null element -> null") {
    val fam = SimilarityQueries.augPlaneFamily _
    def pack(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.SignPack(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(
            c.cast("array<double>")),
          (0 until 32).map(j => fam(j))))
    val short = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
      .select(pack(col("v")).as("s")).collect()
    assert(short(0).isNullAt(0))
    val withNull = Seq(Tuple1((0 until 65).map(i =>
        if (i == 3) null else java.lang.Double.valueOf(i * 0.1))))
      .toDF("v").select(pack(col("v")).as("s")).collect()
    assert(withNull(0).isNullAt(0))
  }
}
