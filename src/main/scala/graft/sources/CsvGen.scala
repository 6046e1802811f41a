package graft.sources

import java.nio.file.{Files, Path}

import scala.util.Random

/** Seedable synthetic-CSV generator mirroring the reference's csv_gen.py
  * (SURVEY.md §2.1 S8): N files with inconsistent schemas —
  * minCols..maxCols randomly named/typed columns of
  * {string,int,float,date,bool} with only the store-id key guaranteed —
  * deterministic per seed. Dual role, same as csv_gen.py for the
  * reference: the fixture source for the fan-out/verify property test
  * (generate random inputs, check invariants; csv_gen.py:45–56) and the
  * [[graft.cli.CsvGenMain]] CLI (csv_gen.py:74–86).
  */
object CsvGen {

  final case class Config(
      nFiles: Int = 5,
      minRows: Int = 50,
      maxRows: Int = 200,
      nStores: Int = 15,
      keyCol: String = "商店序號",
      seed: Long = 42L,
      minCols: Int = 3,
      maxCols: Int = 10)

  private val types = Vector("string", "int", "float", "date", "bool")

  private def cell(r: Random, tpe: String): String = tpe match {
    case "string" => r.alphanumeric.take(3 + r.nextInt(8)).mkString
    case "int" => (r.nextInt(100000) - 50000).toString
    case "float" => // Locale.ROOT: a comma-decimal default locale would
      // break the CSV's column structure with an unquoted ','
      String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(r.nextDouble() * 1000 - 500))
    case "date" => // 2018-01-01 .. 2024-12-31 like csv_gen.py:24–28
      // 2018-01-01..2024-12-31 inclusive is 2557 dates (two leap years);
      // nextInt(2556) would silently exclude the documented upper bound
      java.time.LocalDate.of(2018, 1, 1).plusDays(r.nextInt(2557).toLong).toString
    case "bool" => if (r.nextBoolean()) "true" else "false"
  }

  /** Generate the files into `dir`; returns (fileName, columns) per file. */
  def generate(dir: Path, cfg: Config = Config()): Seq[(String, Seq[String])] = {
    val r = new Random(cfg.seed)
    (0 until cfg.nFiles).map { f =>
      val nCols = cfg.minCols + r.nextInt(cfg.maxCols - cfg.minCols + 1)
      val keyPos = r.nextInt(nCols)
      val cols = (0 until nCols).map { c =>
        if (c == keyPos) cfg.keyCol else s"col_${f}_$c"
      }
      val colTypes = cols.map(c => if (c == cfg.keyCol) "key" else types(r.nextInt(types.size)))
      val nRows = cfg.minRows + r.nextInt(cfg.maxRows - cfg.minRows + 1)
      val sb = new StringBuilder
      // a meta prefix row on some files (the BI-export shape, README.md:65–88)
      if (r.nextBoolean()) sb.append("Report Generated,2025-01-01\n")
      sb.append(cols.mkString(",")).append('\n')
      (0 until nRows).foreach { _ =>
        val row = colTypes.map {
          case "key" => s"S${1 + r.nextInt(cfg.nStores)}"
          case t => cell(r, t)
        }
        sb.append(row.mkString(",")).append('\n')
      }
      val name = f"data_$f%02d.csv"
      Files.writeString(dir.resolve(name), sb.result())
      name -> cols
    }
  }
}
