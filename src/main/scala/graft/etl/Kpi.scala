package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.etl.{Normalize => N}

/** The reference's six store-KPI analytics ("23-1"…"25-2",
  * aggregate_by_store.py:109–723) as reusable DataFrame programs over
  * reference-shaped inputs (all-string BI exports with Chinese headers —
  * FIXTURES.md §A).
  *
  * Input contracts (columns may be messy; every function normalizes):
  *   - binds (A2 區間綁定推薦人人數): 商店序號, 年度, 月份, 總綁定
  *   - cumulative (A3): 商店序號, 累計至今推薦人綁定人數
  *   - members (A4): 商店序號, 總會員數
  *   - firstByMonth (A5): 商店序號, 月份(aliases), 門市首購人數
  *   - firstByBranch (A6): 商店序號, 門市名稱(aliases), 門市首購人數
  *   - branchBinds (A7): 商店序號, 門市名稱(aliases), 年度, 總綁定數
  *
  * Null/zero duality is the reference's exact contract (SURVEY.md §7.4):
  * missing measures fill 0 (aggregate_by_store.py:135, 201–202), zero
  * denominators yield null rendered "" by the pct formatter (:168–170,
  * 204–206, 209–215). Years compare as strings (:137–145).
  *
  * Scale: each config is filter → hash-agg → broadcast-sized left joins →
  * window top-k; no driver-side loops (the reference's per-store Python
  * loops become partitioned writes / windows).
  */
object Kpi {

  val S = "商店序號" // store id (fan_out_by_storeid.py:22)

  private def store(df: DataFrame): DataFrame =
    df.withColumn(S, trim(col(S)))

  /** A2 normalization: trimmed store, parsed month 1..12, numeric bind.
    * The year column stays RAW — the reference never strips it in any
    * config (aggregate_by_store.py:138,143,265,346–347,483,568 all
    * compare unstripped strings; only store/branch columns get
    * `.str.strip()`), so a padded `" 2025"` row never matches a year
    * filter here either.
    */
  def normBinds(binds: DataFrame): DataFrame =
    store(Normalize.trimHeaders(binds))
      .withColumn("月份", N.parseMonth(col("月份")))
      .filter(col("月份").isNotNull)
      .withColumn("總綁定", N.zeroFill(N.toNumber(col("總綁定"))))

  /** A2 normalization for config 24-1 (aggregate_by_store.py:342–346):
    * like [[normBinds]] but WITHOUT the month parse/filter — 24-1 sums
    * every row of the year slice, including unparseable months. Year
    * strings stay raw in both (see [[normBinds]]).
    */
  def normBindsNoMonth(binds: DataFrame): DataFrame =
    store(Normalize.trimHeaders(binds))
      .withColumn("總綁定", N.zeroFill(N.toNumber(col("總綁定"))))

  /** Shared 23-1 / 24-1 body.
    *
    * The cur/prev year sums are ONE conditional aggregation over a single
    * normalized scan (not two filtered scans + a self-join): a store "has
    * current-year data" ⟺ its conditional cur-sum is non-null, because
    * zeroFill makes every surviving row's measure non-null. Halves the
    * fact-side work and drops a shuffle+join from the plan.
    */
  private def config23Core(
      binds: DataFrame,
      cumulative: DataFrame,
      members: DataFrame,
      curYear: String,
      prevYear: String,
      parseMonths: Boolean,
      order24_1: Boolean): DataFrame = {
    val nb = if (parseMonths) normBinds(binds) else normBindsNoMonth(binds)
    val yearSums = nb
      .groupBy(col(S))
      .agg(
        sum(when(col("年度") === curYear, col("總綁定"))).as("cur"),
        sum(when(col("年度") === prevYear, col("總綁定"))).as("prev"))
      .filter(col("cur").isNotNull) // = stores with cur-year rows
    val cum = store(Normalize.trimHeaders(cumulative))
      .withColumn("c", N.zeroFill(N.toNumber(col("累計至今推薦人綁定人數"))))
      .groupBy(col(S)).agg(sum(col("c")).as("cum"))
    val mem = store(Normalize.trimHeaders(members))
      .withColumn("m", N.zeroFill(N.toNumber(col("總會員數"))))
      .groupBy(col(S)).agg(sum(col("m")).as("mem"))
    val joined = yearSums
      .join(cum, Seq(S), "left")
      .join(mem, Seq(S), "left")
      .select(col(S), col("cur"),
        N.zeroFill(col("prev")).as("prev"),
        N.zeroFill(col("cum")).as("cum"),
        N.zeroFill(col("mem")).as("mem"))
    val out = joined.select(
      col(S),
      col("cur").as("區間推薦人綁定人數"),
      N.fmtPct(N.yoy(col("cur"), col("prev"))).as("區間推薦人綁定人數 YoY"),
      N.fmtPct(N.safeDiv(col("cum"), col("mem"))).as("推薦人綁定率"))
    if (order24_1)
      out.select(col(S), col("推薦人綁定率"), col("區間推薦人綁定人數"),
        col("區間推薦人綁定人數 YoY"))
    else out
  }

  /** Config 23-1 (aggregate_by_store.py:109–236): interval binds + YoY +
    * binding rate; months normalized to 1..12 and out-of-range rows
    * dropped (:126–134).
    */
  def config23_1(
      binds: DataFrame,
      cumulative: DataFrame,
      members: DataFrame,
      curYear: String = "2025",
      prevYear: String = "2024"): DataFrame =
    config23Core(binds, cumulative, members, curYear, prevYear,
      parseMonths = true, order24_1 = false)

  /** Config 24-1 (aggregate_by_store.py:320–419): the same KPIs as 23-1
    * but with NO month normalization/filter (:342–346 — every row of the
    * year slice counts, unparseable months included) and the
    * 推薦人綁定率-first column order (:400–405).
    */
  def config24_1(
      binds: DataFrame,
      cumulative: DataFrame,
      members: DataFrame,
      curYear: String = "2025",
      prevYear: String = "2024"): DataFrame =
    config23Core(binds, cumulative, members, curYear, prevYear,
      parseMonths = false, order24_1 = true)

  /** The generic config-driven aggregation path (aggregate_by_store.py:
    * 725–762) — the reference's declared extensibility contract, reachable
    * for any config key without a dedicated block: bare numeric coercion +
    * fill-0 on the target column (:736–739, plain `pd.to_numeric`, no
    * thousands-separator cleanup), months-set membership on the RAW month
    * strings (:742 — string equality, no parsing), then groupby-sum per
    * store renamed `total` (:745–748).
    */
  def generic(
      df: DataFrame,
      storeCol: String,
      monthCol: String,
      targetCol: String,
      months: Seq[String]): DataFrame =
    df.filter(col(monthCol).isin(months: _*))
      .groupBy(col(storeCol))
      .agg(sum(N.zeroFill(N.bareNumber(col(targetCol)))).as("total"))

  /** Config 23-2 (aggregate_by_store.py:239–317): per-month pivot of two
    * years, months densified 1..12 per store, per-month YoY.
    */
  def config23_2(
      binds: DataFrame,
      curYear: String = "2025",
      prevYear: String = "2024"): DataFrame = {
    val spark = binds.sparkSession
    val f = normBinds(binds).filter(col("年度").isin(prevYear, curYear))
    val pv = f.groupBy(col(S), col("月份"))
      .pivot("年度", Seq(prevYear, curYear)).sum("總綁定")
    val spine = f.select(col(S)).distinct()
      .crossJoin(broadcast(spark.range(1, 13).select(col("id").cast("int").as("月份"))))
    spine.join(pv, Seq(S, "月份"), "left")
      .select(col(S), col("月份"),
        N.zeroFill(col(prevYear)).as(s"${prevYear}年"),
        N.zeroFill(col(curYear)).as(s"${curYear}年"),
        N.fmtPct(N.yoy(N.zeroFill(col(curYear)), N.zeroFill(col(prevYear))))
          .as("推薦人新綁定數 YoY"))
  }

  /** Config 24-2 (aggregate_by_store.py:422–510): first purchases vs
    * referral binds per (store, month) with monthly binding rate.
    */
  def config24_2(
      firstByMonth: DataFrame,
      binds: DataFrame,
      curYear: String = "2025"): DataFrame = {
    val fp = store(SchemaResolver.ensureMonthCol(Normalize.trimHeaders(firstByMonth)))
      .withColumn("月份", N.parseMonth(col("月份")))
      .filter(col("月份").isNotNull)
      .withColumn("fp", N.zeroFill(N.toNumber(col("門市首購人數"))))
      .groupBy(col(S), col("月份")).agg(sum(col("fp")).as("門市首購人數"))
    val b = normBinds(binds).filter(col("年度") === curYear)
      .groupBy(col(S), col("月份")).agg(sum(col("總綁定")).as("binds"))
    fp.join(b, Seq(S, "月份"), "left")
      .select(col(S), col("月份"), col("門市首購人數"),
        N.zeroFill(col("binds")).as("推薦人綁定數"),
        N.fmtPct(N.safeDiv(N.zeroFill(col("binds")), col("門市首購人數")))
          .as("推薦人綁定率"))
  }

  /** Shared 25-x body (aggregate_by_store.py:513–611, 614–723): per-branch
    * first purchases vs cumulative binds, ratio, per-store top/bottom-5.
    */
  private def config25(
      firstByBranch: DataFrame,
      branchBinds: DataFrame,
      year: String,
      bottom: Boolean): DataFrame = {
    val B = "門市名稱"
    val fp = store(SchemaResolver.ensureStoreNameCol(Normalize.trimHeaders(firstByBranch)))
      .withColumn(B, N.nullifyTokens(col(B)))
      .filter(col(B).isNotNull)
      .withColumn("fp", N.zeroFill(N.toNumber(col("門市首購人數"))))
      .groupBy(col(S), col(B)).agg(sum(col("fp")).as("門市首購人數"))
    val bb = store(SchemaResolver.ensureStoreNameCol(Normalize.trimHeaders(branchBinds)))
      .withColumn(B, N.nullifyTokens(col(B)))
      .filter(col(B).isNotNull)
      .filter(col("年度") === year) // raw compare (aggregate_by_store.py:568,680)
      .withColumn("b", N.zeroFill(N.toNumber(col("總綁定數"))))
      .groupBy(col(S), col(B)).agg(sum(col("b")).as("binds"))
    val ratio = fp.join(bb, Seq(S, B), "left")
      .select(col(S), col(B), col("門市首購人數"),
        N.zeroFill(col("binds")).as("推薦人綁定人數"),
        N.safeDiv(N.zeroFill(col("binds")), col("門市首購人數")).as("_ratio"))
    // deterministic tie-break on branch name (SURVEY.md §2.5: the
    // reference's unstable pandas sort is pinned to a total order)
    val ranked =
      if (bottom) TopK.bottomK(ratio, Seq(col(S)), col("_ratio"), col(B), 5)
      else TopK.topK(ratio, Seq(col(S)), col("_ratio"), col(B), 5)
    ranked.select(col(S), col(B), col("門市首購人數"), col("推薦人綁定人數"),
      N.fmtPct(col("_ratio")).as("佔比"))
  }

  /** Config 25-1: top-5 branches per store by 佔比 DESC (:593–594). */
  def config25_1(firstByBranch: DataFrame, branchBinds: DataFrame,
                 year: String = "2025"): DataFrame =
    config25(firstByBranch, branchBinds, year, bottom = false)

  /** Config 25-2: bottom-5 branches per store by 佔比 ASC (:705–706). */
  def config25_2(firstByBranch: DataFrame, branchBinds: DataFrame,
                 year: String = "2025"): DataFrame =
    config25(firstByBranch, branchBinds, year, bottom = true)
}
