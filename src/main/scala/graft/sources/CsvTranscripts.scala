package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.text.TextAnalysis

/** S6 — CSV transcript ingest (the v1 backfill,
  * read_in_v_1_files.py:134-183). The reference walks a folder of
  * per-video `<vid_id>.csv` files (columns exactly
  * `{text, start, duration}`), skips any file whose column set
  * differs, and inserts rows with the derived columns
  * `text_formatted` (F1 normalize), `word_count` (F2) and
  * `cum_word_count` (W1 running sum in file order), deduplicating on
  * `(vid_id, start)` (`ON CONFLICT DO NOTHING`).
  *
  * Spark-first shape: ONE `spark.read.csv` over the whole folder (a
  * single distributed scan — not a driver loop over files), with
  * `vid_id` recovered from the file name via `input_file_name()`. The
  * per-file column validation the reference does file-at-a-time
  * becomes [[validateHeaders]]: a header-only `spark.read.text` pass
  * (reads the first line of each file, negligible IO) that returns the
  * rejected files — callers filter the main scan with the result,
  * keeping the good-file behavior ("skip that vid, ingest the rest")
  * without ever loading bad files. At 100 TB the main scan is
  * partitioned by Spark over file splits; the derived columns are all
  * codegen'd builtins and the only shuffle is the per-video window for
  * the running count.
  */
object CsvTranscripts {

  /** The reference's required column set (set equality — extra columns
    * reject the file too, read_in_v_1_files.py:146-149). */
  val RequiredColumns: Set[String] = Set("text", "start", "duration")

  val schema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("start", DoubleType),
    StructField("duration", DoubleType)))

  /** Header-only validation pass: one row per file with its header
    * column set and an `ok` verdict. Genuinely header-only IO: the file
    * list distributes over tasks and each task opens its files and
    * reads just the first line (a buffered read pulls one block, not
    * the file) — no `wholetext` materialization of full payloads, no
    * double read of the folder's bytes, no unsplittable giant records.
    * Set equality is checked both ways (extra AND missing columns
    * reject). */
  def validateHeaders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hadoopConf = s.sparkContext.hadoopConfiguration
    val pattern = new Path(s"$dir/*.csv")
    val fs = pattern.getFileSystem(hadoopConf)
    val files = Option(fs.globStatus(pattern)).getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq
    val serConf = new org.apache.spark.util.SerializableConfiguration(hadoopConf)
    val required = RequiredColumns
    val parts = math.min(math.max(1, files.length / 256 + 1), 1024)
    s.createDataset(s.sparkContext.parallelize(files, parts).mapPartitions { it =>
      val conf = serConf.value
      it.map { f =>
        val p = new Path(f)
        val in = p.getFileSystem(conf).open(p)
        val header =
          try {
            val r = new java.io.BufferedReader(
              new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
            Option(r.readLine()).getOrElse("")
          } finally in.close()
        val cols = header.split(",", -1).toSeq
        (f, cols, cols.toSet == required)
      }
    }).toDF("file", "columns", "ok")
  }

  /** Full ingest of every valid per-video CSV under `dir`: returns the
    * transcript-table shape `(vid_id, text, start, duration,
    * text_formatted, word_count, cum_word_count)`. Files failing
    * [[validateHeaders]] are skipped via a (broadcast) anti-join — no
    * driver-side file list; duplicate `(vid_id, start)` rows collapse
    * to one (the ON CONFLICT DO NOTHING contract — which row wins a
    * same-key tie is nondeterministic, exactly as concurrent inserts
    * are in the reference). */
  def ingest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // anti-join on the basename: globStatus ("file:/...") and
    // input_file_name ("file:///...") render the same path with
    // different scheme spellings, and per-video file names are unique
    // within the drop folder by construction (<vid_id>.csv).
    // input_file_name additionally percent-encodes (a space becomes
    // %20 while globStatus keeps it literal, and a literal % arrives
    // as %25) — BUT leaves '+' unescaped, and url_decode form-decodes
    // '+' to a space; escaping '+' to %2B first makes the decode
    // faithful for every filename.
    val bad = validateHeaders(s, dir).filter(!$"ok")
      .select(regexp_extract($"file", "([^/]+)$", 1).as("fname"))
    val raw = s.read
      .option("header", "true")
      .schema(schema)
      .csv(s"$dir/*.csv")
      .withColumn("file",
        url_decode(regexp_replace(input_file_name(), "\\+", "%2B")))
      .withColumn("fname", regexp_extract($"file", "([^/]+)$", 1))
    val good = raw.join(broadcast(bad), Seq("fname"), "left_anti").drop("fname")
    val byVid = good
      .withColumn("vid_id", regexp_extract($"file", "([^/]+)\\.csv$", 1))
      .drop("file")
      .dropDuplicates("vid_id", "start")
      .withColumn("text_formatted", TextAnalysis.textFormatted($"text"))
      .withColumn("word_count", TextAnalysis.wordCount($"text_formatted"))
    byVid.withColumn("cum_word_count",
      sum($"word_count").over(Window.partitionBy($"vid_id").orderBy($"start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
