package graft

import org.apache.spark.sql.functions._

import graft.etl.{Kpi, Normalize, SchemaResolver}

/** Normalization kit + schema resolution + KPI configs on literal frames
  * (fixture strings from FIXTURES.md §A / reference aggregate_by_store.py).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("_").select(c.as("v")).collect()(0).get(0)

  test("toNumber: human-format cleanup and coerce-to-null") {
    val cases = Seq(
      " 1,234 " -> 1234.0, "12%" -> 12.0, "1.5e3" -> 1500.0,
      "-2.5" -> -2.5, ".5" -> 0.5, "+7" -> 7.0)
    for ((raw, want) <- cases)
      assert(one(Normalize.toNumber(lit(raw))) == want, raw)
    // pandas str.replace drops every "%"/"," before coercing: "12%5" → 125
    assert(one(Normalize.toNumber(lit("12%5"))) == 125.0)
    for (raw <- Seq("nan", "None", "", "abc", "1-2"))
      assert(one(Normalize.toNumber(lit(raw))) == null, raw)
    // pandas' parser accepts infinity tokens (precise_xstrtod) and
    // fillna(0) does NOT fill inf — must parse, not null out
    for (raw <- Seq("inf", "Infinity", "+INF", " inf "))
      assert(one(Normalize.toNumber(lit(raw))) == Double.PositiveInfinity, raw)
    assert(one(Normalize.toNumber(lit("-inf"))) == Double.NegativeInfinity)
    assert(one(Normalize.bareNumber(lit("-Infinity"))) == Double.NegativeInfinity)
    assert(one(Normalize.bareNumber(lit("infinite"))) == null) // not a token
  }

  test("parseMonth: heterogeneous formats → 1..12 or null") {
    val cases = Seq(
      "1" -> 1, "01" -> 1, "202501" -> 1, "2025-12" -> 12, "2025/07" -> 7,
      " 11 " -> 11)
    for ((raw, want) <- cases)
      assert(one(Normalize.parseMonth(lit(raw))) == want, raw)
    for (raw <- Seq("13", "0", "n/a", "", "202500"))
      assert(one(Normalize.parseMonth(lit(raw))) == null, raw)
  }

  test("fmtPct: null → empty string, 2-decimal percent otherwise") {
    assert(one(Normalize.fmtPct(lit(null).cast("double"))) == "")
    assert(one(Normalize.fmtPct(lit(0.125))) == "12.50%")
    assert(one(Normalize.fmtPct(lit(0.0))) == "0.00%")
    assert(one(Normalize.fmtPct(lit(1.0))) == "100.00%")
  }

  test("safeDiv: zero or null denominator → null, not error (ANSI-safe)") {
    assert(one(Normalize.safeDiv(lit(1.0), lit(0.0))) == null)
    assert(one(Normalize.safeDiv(lit(1.0), lit(null).cast("double"))) == null)
    assert(one(Normalize.safeDiv(lit(3.0), lit(2.0))) == 1.5)
  }

  test("nullifyTokens + yoy") {
    for (t <- Normalize.nullTokens)
      assert(one(Normalize.nullifyTokens(lit(t))) == null, s"'$t'")
    assert(one(Normalize.nullifyTokens(lit(" ok "))) == "ok")
    assert(one(Normalize.yoy(lit(150.0), lit(100.0))) == 0.5)
    assert(one(Normalize.yoy(lit(150.0), lit(0.0))) == null)
  }

  test("trimHeaders strips column-name whitespace") {
    val df = Seq((1, 2)).toDF(" a ", "b\t")
    assert(Normalize.trimHeaders(df).columns.toSeq == Seq("a", "b"))
  }

  test("SchemaResolver: exact, padded, case-insensitive, and failure") {
    val df = Seq(("1", "x")).toDF(" 月份 ", "v")
    assert(SchemaResolver.ensureMonthCol(df).columns.contains("月份"))
    val df2 = Seq(("1", "x")).toDF("MONTH", "v")
    assert(SchemaResolver.ensureMonthCol(df2).columns.contains("月份"))
    val df3 = Seq(("1", "x")).toDF("store_NAME", "v") // case-insensitive path
    assert(SchemaResolver.ensureStoreNameCol(df3).columns.contains("門市名稱"))
    val err = intercept[IllegalArgumentException] {
      SchemaResolver.ensureMonthCol(Seq(("1", "x")).toDF("a", "b"))
    }
    assert(err.getMessage.contains("available: a, b"))
  }

  test("Kpi 23-1: YoY + binding rate with the null-vs-zero duality") {
    val binds = Seq(
      // store 1: cur 10+5, prev 10 → YoY 50.00%
      ("1", "2025", "01", "10"), ("1", "2025", "202502", " 5 "),
      ("1", "2024", "2024-03", "10"),
      // store 2: cur 8, prev 0 rows → YoY null → ""
      ("2", "2025", "1", "4"), ("2", "2025", "2", "1,004"), // 1,004 → 1004... wait: (4+1004)=1008
      // month invalid → dropped
      ("1", "2025", "n/a", "999"))
      .toDF("商店序號", "年度", "月份", "總綁定")
    val cum = Seq(("1", "50"), ("2", "nan")).toDF("商店序號", "累計至今推薦人綁定人數")
    val mem = Seq(("1", "200"), ("2", "0")).toDF("商店序號", "總會員數")
    val out = Kpi.config23_1(binds, cum, mem).orderBy("商店序號").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getString(0) == "1")
    assert(r1.getDouble(1) == 15.0)
    assert(r1.getString(2) == "50.00%") // (15-10)/10
    assert(r1.getString(3) == "25.00%") // 50/200
    val r2 = out(1)
    assert(r2.getDouble(1) == 1008.0)
    assert(r2.getString(2) == "") // prev 0 → null → ""
    assert(r2.getString(3) == "") // members 0 → null → ""
  }

  test("Kpi 24-1: no month filter (unparseable months count), rate-first order") {
    val binds = Seq(
      ("1", "2025", "01", "10"), ("1", "2024", "03", "10"),
      // unparseable month: DROPPED by 23-1, COUNTED by 24-1
      ("1", "2025", "n/a", "5"))
      .toDF("商店序號", "年度", "月份", "總綁定")
    val cum = Seq(("1", "50")).toDF("商店序號", "累計至今推薦人綁定人數")
    val mem = Seq(("1", "200")).toDF("商店序號", "總會員數")
    val out24 = Kpi.config24_1(binds, cum, mem).collect()(0)
    assert(out24.schema.fieldNames.toSeq ==
      Seq("商店序號", "推薦人綁定率", "區間推薦人綁定人數", "區間推薦人綁定人數 YoY"))
    assert(out24.getDouble(2) == 15.0)       // 10 + 5 (n/a month included)
    assert(out24.getString(3) == "50.00%")   // (15-10)/10
    val out23 = Kpi.config23_1(binds, cum, mem).collect()(0)
    assert(out23.getDouble(1) == 10.0)       // n/a month dropped
  }

  test("Kpi compares RAW year strings in every config") {
    val binds = Seq(
      ("1", "2025", "01", "10"),
      ("1", " 2025", "02", "5"))  // padded year
      .toDF("商店序號", "年度", "月份", "總綁定")
    val cum = Seq(("1", "0")).toDF("商店序號", "累計至今推薦人綁定人數")
    val mem = Seq(("1", "1")).toDF("商店序號", "總會員數")
    // the reference never strips the year column (aggregate_by_store.py:
    // 138,143,265,346–347,483,568) → padded row excluded everywhere
    assert(Kpi.config24_1(binds, cum, mem).collect()(0).getDouble(2) == 10.0)
    assert(Kpi.config23_1(binds, cum, mem).collect()(0).getDouble(1) == 10.0)
  }

  test("Kpi generic: raw month-string membership + bare coercion") {
    val df = Seq(
      ("1", "202501", " 10 "),   // padded number: coerced
      ("1", "202501", "1,000"),  // comma: NOT cleaned by the bare path → 0
      ("1", "202502", "nan"),    // null token → 0
      ("1", "2025-01", "99"),    // raw string not in months set → filtered
      ("2", "202512", "7"))
      .toDF("store_id", "yyyymm", "visit_count")
    val months = (1 to 12).map(m => f"2025$m%02d")
    val out = Kpi.generic(df, "store_id", "yyyymm", "visit_count", months)
      .orderBy("store_id").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("1", 10.0), ("2", 7.0)))
  }

  test("Kpi 23-2: months densified 1..12 with fill-0") {
    val binds = Seq(
      ("1", "2025", "01", "10"), ("1", "2024", "01", "5"),
      ("1", "2025", "03", "6"))
      .toDF("商店序號", "年度", "月份", "總綁定")
    val out = Kpi.config23_2(binds).orderBy("月份").collect()
    assert(out.length == 12)
    assert(out(0).getDouble(2) == 5.0 && out(0).getDouble(3) == 10.0)
    assert(out(0).getString(4) == "100.00%")
    assert(out(1).getDouble(2) == 0.0 && out(1).getDouble(3) == 0.0)
    assert(out(1).getString(4) == "") // 0/0 → ""
    assert(out(2).getDouble(3) == 6.0)
  }

  test("Kpi 25-1: per-store top-5 with deterministic tie-break") {
    val fp = (1 to 7).map(i => ("s", s"br_$i", "10")) :+ (("s", "NULL", "99"))
    val bb = (1 to 7).map(i => ("s", s"br_$i", "2025", if (i <= 2) "20" else "10"))
    val out = Kpi.config25_1(
      fp.toDF("商店序號", "門市", "門市首購人數"),
      bb.toDF("商店序號", "Store Name", "年度", "總綁定數")).collect()
    assert(out.length == 5)
    // br_1, br_2 ratio 2.0 lead; br_3..br_5 tie at 1.0 broken by name asc
    assert(out.map(_.getString(1)).toSeq == Seq("br_1", "br_2", "br_3", "br_4", "br_5"))
    assert(out(0).getString(4) == "200.00%")
  }
}
