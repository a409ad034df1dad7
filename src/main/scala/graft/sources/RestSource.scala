package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import scala.reflect.runtime.universe.TypeTag

/** Paged REST-style source (reference: dw-etl `himalayan_etl/ops/extract.py
  * :258-297` — per-indicator paged GET of the World Bank API, each page's
  * nested JSON flattened to flat typed records, all pages appended).
  *
  * The fetch itself is driver-side (an external API is a single endpoint —
  * parallelizing the HTTP layer is a rate-limit question, not a Spark one);
  * the result immediately becomes a distributed Dataset. The fetcher is
  * injected as a plain function so tests and offline runs use a deterministic
  * generator instead of a network call. For a source too large to stage
  * through the driver, the scale path is a DataSource V2 `TableProvider`
  * whose `InputPartition`s each fetch one page range — same page protocol,
  * executor-side.
  */
object RestSource {

  /** Fetch pages `0, 1, 2, …` until the fetcher returns an empty page (the
    * reference stops when the API yields no rows) or `maxPages` is reached;
    * union everything into one Dataset.
    */
  def paged[T <: Product : TypeTag](spark: SparkSession, fetchPage: Int => Seq[T],
                                    maxPages: Int = 10000): Dataset[T] = {
    import spark.implicits._
    val pages = Iterator.from(0)
      .map(fetchPage)
      .takeWhile(_.nonEmpty)
      .take(maxPages)
      .toSeq
    spark.createDataset(pages.flatten)
  }

  /** Retry with fixed backoff (reference `RetryPolicy(max_retries=3,
    * delay=1.0)`, `ops/extract.py:13`) for the driver-side fetch; Spark task
    * retries cover everything executor-side.
    */
  def withRetry[A](maxRetries: Int = 3, delayMs: Long = 1000)(f: => A): A = {
    var attempt = 0
    var result: Option[A] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= maxRetries) {
      try result = Some(f)
      catch {
        case e: Throwable =>
          lastErr = e; attempt += 1
          if (attempt <= maxRetries) Thread.sleep(delayMs)
      }
    }
    result.getOrElse(throw lastErr)
  }
}
