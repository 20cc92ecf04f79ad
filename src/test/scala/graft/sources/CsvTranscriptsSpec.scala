package graft.sources

import java.nio.file.{Files, Path}
import graft.SparkSpec

/** S6 CSV ingest: column-set validation (set equality, both
  * directions), vid_id from file name, F1/F2/W1 derived columns, and
  * (vid_id, start) dedup — read_in_v_1_files.py:134-183 semantics. */
class CsvTranscriptsSpec extends SparkSpec {

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n"))

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft-csv")
    write(d, "vidA.csv",
      "text,start,duration",
      "\"Hello [music] World!\",0.0,1.5",
      "\"second line\",1.5,2.0",
      "\"second dupe\",1.5,2.0", // duplicate start -> one survives (same word count)
      "\"third, with comma\",3.5,1.0")
    write(d, "vidB.csv",
      "text,start,duration",
      "\"{applause} only\",0.0,2.0")
    // extra column -> rejected (set equality, not subset)
    write(d, "vidC.csv",
      "text,start,duration,lang",
      "\"bad file\",0.0,1.0,en")
    // missing column -> rejected
    write(d, "vidD.csv",
      "text,start",
      "\"also bad\",0.0")
    // bad file with a URI-encodable name: input_file_name yields
    // "bad%20vid.csv" while globStatus keeps "bad vid.csv" — the
    // anti-join must still skip it (url_decode normalization)
    write(d, "bad vid.csv",
      "text,start,duration,lang",
      "\"sneaky\",0.0,1.0,en")
    // '+' is NOT percent-encoded by input_file_name but url_decode
    // form-decodes it to a space — the pre-escape must keep it literal
    write(d, "plus+vid.csv",
      "text,start,duration",
      "\"plus file\",0.0,1.0")
    d
  }

  test("validateHeaders flags exactly the bad-column files") {
    val v = validateResults
    assert(v == Map("vidA" -> true, "vidB" -> true, "vidC" -> false,
      "vidD" -> false, "bad vid" -> false, "plus+vid" -> true))
  }

  private def validateResults: Map[String, Boolean] =
    CsvTranscripts.validateHeaders(spark, dir.toString).collect()
      .map(r => (r.getString(0).replaceAll(".*/|\\.csv$", ""), r.getBoolean(2)))
      .toMap

  test("ingest skips invalid files, derives vid_id + normalize + running count") {
    import org.apache.spark.sql.functions._
    val out = CsvTranscripts.ingest(spark, dir.toString).orderBy("vid_id", "start")
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("vid_id")).toSet == Set("vidA", "vidB", "plus+vid"))
    assert(rows.length == 5) // 3 distinct starts for vidA + 1 vidB + 1 plus+vid
    val a = rows.filter(_.getAs[String]("vid_id") == "vidA")
    // F1: "[music]" stripped greedily, punctuation dropped, lowered
    assert(a(0).getAs[String]("text_formatted") == "hello  world")
    assert(a(0).getAs[Int]("word_count") == 2)
    // W1: running sum in start order: 2, +2, +3 ("third with comma")
    assert(a.map(_.getAs[Long]("cum_word_count")).toSeq == Seq(2L, 4L, 7L))
    val b = rows.filter(_.getAs[String]("vid_id") == "vidB").head
    assert(b.getAs[String]("text_formatted") == " only")
    assert(b.getAs[Long]("cum_word_count") == 1L)
    // quoted comma stays one field
    assert(a(2).getAs[String]("text") == "third, with comma")
  }
}
