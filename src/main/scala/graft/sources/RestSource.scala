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
    * union everything into one Dataset. Each page fetch is retried with
    * bounded exponential backoff (a transient API hiccup must not abort an
    * extract that is N-1 pages in).
    */
  def paged[T <: Product : TypeTag](spark: SparkSession, fetchPage: Int => Seq[T],
                                    maxPages: Int = 10000,
                                    maxRetries: Int = 3,
                                    retryDelayMs: Long = 1000): Dataset[T] = {
    import spark.implicits._
    val pages = Iterator.from(0)
      .map(p => withRetry(maxRetries, retryDelayMs)(fetchPage(p)))
      .takeWhile(_.nonEmpty)
      .take(maxPages)
      .toSeq
    spark.createDataset(pages.flatten)
  }

  /** Bounded exponential backoff (reference `RetryPolicy(max_retries=3,
    * delay=1.0)`, `ops/extract.py:5,13`, with exponential growth instead of
    * the reference's fixed delay): attempt k sleeps `delayMs · 2^k`, capped
    * at `maxDelayMs`. Used for the driver-side fetch AND inside the DSv2
    * partition reader — Spark task retries re-run a whole partition (all its
    * pages); a per-page retry is the cheaper first line of defense.
    */
  def withRetry[A](maxRetries: Int = 3, delayMs: Long = 1000,
                   maxDelayMs: Long = 30000)(f: => A): A = {
    var attempt = 0
    var result: Option[A] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= maxRetries) {
      try result = Some(f)
      catch {
        case e: Throwable =>
          lastErr = e; attempt += 1
          if (attempt <= maxRetries) {
            // clamp the shift: delayMs << k overflows Long for k ≥ 63 (and a
            // negative sleep would throw from inside this handler, masking
            // the real failure); past 2^15 the cap has long since won anyway
            val backoff =
              if (attempt - 1 >= 15) maxDelayMs
              else math.min(delayMs << (attempt - 1), maxDelayMs)
            Thread.sleep(backoff)
          }
      }
    }
    result.getOrElse(throw lastErr)
  }
}
