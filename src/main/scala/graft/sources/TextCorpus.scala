package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-corpus interchange formats beyond parquet: JSONL (the lingua
  * franca of LLM corpus distribution — one document object per line)
  * and quoted CSV, both with the EXPLICIT documents schema.
  *
  * The explicit schema is the scale rule: `inferSchema`/schema-less
  * reads are a full extra pass over 100 TB before the first real scan,
  * and a sampled inference can mis-type a column the tail disagrees
  * with. Writers shard by a deterministic doc_id hash partitioning so
  * re-runs lay out identically; readers are plain DataSource scans that
  * keep column pruning and (for parquet-adjacent formats) predicate
  * pushdown available to Catalyst.
  */
object TextCorpus {

  /** The documents table schema, stated once. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL corpus. FAILFAST: a malformed line at 100 TB is data
    * loss to surface, not a null row to swallow silently.
    */
  def readJsonl(s: SparkSession, path: String): DataFrame =
    s.read.schema(documentsSchema).option("mode", "FAILFAST").json(path)

  /** Write a corpus as JSONL in `parts` deterministic hash shards. */
  def writeJsonl(df: DataFrame, path: String, parts: Int): Unit =
    df.repartition(parts, col("doc_id"))
      .write.mode("overwrite").json(path)

  /** Read a quoted CSV corpus. `multiLine` because document text
    * contains newlines — the quote/escape convention below is what
    * [[writeCsv]] emits, so the pair round-trips losslessly INCLUDING
    * the empty-string/null distinction (r10 ADVICE: Spark's CSV default
    * reads an empty field back as null). The convention is the
    * Hive/MySQL one: every value is quoted (`quoteAll`), null is the
    * unquoted `\N` sentinel, whitespace is never trimmed — so `""` reads
    * back as the empty string (the parsed value no longer collides with
    * `nullValue`) and `\N` reads back as null. Pinned by the round-trip
    * spec on a fixture with empty, null, and whitespace-only fields.
    * One documented collision inherent to CSV: a field whose VALUE is
    * the literal string `\N` is indistinguishable from null — corpora
    * that may contain it should ride [[readJsonl]]/[[writeJsonl]], the
    * fully general interchange format.
    */
  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.schema(documentsSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("emptyValue", "")
      .option("nullValue", "\\N")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Write a corpus as quoted CSV in `parts` deterministic hash shards
    * (see [[readCsv]] for the round-trip convention).
    */
  def writeCsv(df: DataFrame, path: String, parts: Int): Unit =
    df.repartition(parts, col("doc_id"))
      .write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("quoteAll", "true")
      .option("emptyValue", "\"\"")
      .option("nullValue", "\\N")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
}
