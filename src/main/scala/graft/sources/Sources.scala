package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File sources/sinks — reference O1-O6 (/root/reference/Database.py:64-92,
  * /root/reference/filefilter.py:374-379), re-expressed as Spark readers
  * so scans are distributed, column-pruned and predicate-pushed.
  */
object Sources {

  /** Load a tabular file by extension. CSV/TSV/TXT get header + schema
    * inference with the configured delimiter (Database.py:77-78); parquet
    * is native (Database.py:79-80); `s3://` becomes `s3a://` and is read
    * through the Hadoop S3A connector with the default credential chain —
    * the Spark analog of the reference's httpfs + CREDENTIAL_CHAIN secret
    * (Database.py:72-75). Unknown extensions fail fast (Database.py:81-82).
    * `sampleLines > 0` limits rows exactly once at the source (the
    * reference leaks its LIMIT into later cursors — SURVEY §2 O5).
    */
  /** `TAB`/`tab` mean a tab character (reference loaders.py:10-13,
    * "use TAB or tab por tabs" in the example YAML comments).
    */
  private def normDelim(d: String): String =
    if (d.equalsIgnoreCase("TAB")) "\t" else d

  def load(spark: SparkSession, path: String, inDelimiter: String = ",",
           sampleLines: Long = 0L): DataFrame = {
    val p = if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://") else path
    val lower = p.toLowerCase
    val df =
      if (lower.endsWith(".parquet")) spark.read.parquet(p)
      else if (lower.endsWith(".csv") || lower.endsWith(".txt") || lower.endsWith(".tsv")) {
        val delim = if (lower.endsWith(".tsv") && inDelimiter == ",") "\t"
                    else normDelim(inDelimiter)
        spark.read
          .option("header", "true")
          .option("inferSchema", "true")
          .option("delimiter", delim)
          .csv(p)
      } else
        throw new IllegalArgumentException(
          s"Unsupported file format: $path (supported: .csv .txt .tsv .parquet)")
    if (sampleLines > 0L) df.limit(sampleLines.toInt) else df
  }

  /** Directory of raw media files as a DataFrame of opaque binary
    * payloads (path, modificationTime, length, content) — the input
    * shape for the multimodal operators ([[graft.operators.MediaColumns]]).
    * Spark's binaryFile source splits by file, so decode parallelism is
    * per-file; `pathGlobFilter` bounds the scan (e.g. "*.png").
    */
  def loadBinary(spark: SparkSession, dir: String,
                 glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.foreach(g => r.option("pathGlobFilter", g))
    r.load(dir)
  }

  /** CSV sink with delimiter + header — reference COPY TO
    * (filefilter.py:374-379). `singleFile` coalesces to one partition for
    * byte-level parity with the reference's single output file; leave it
    * false at scale so the write stays parallel.
    */
  def writeCsv(df: DataFrame, path: String, outDelimiter: String = ",",
               singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .option("header", "true")
      .option("delimiter", normDelim(outDelimiter))
      .mode("overwrite")
      .csv(path)
  }
}
