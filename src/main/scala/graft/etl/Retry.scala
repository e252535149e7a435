package graft.etl

import scala.annotation.tailrec

/** Transient-failure retry with exponential backoff — the engine-side twin of
  * the reference's `retry_on_exception` decorator (`dags/hanger_lane.py:81-109`,
  * N attempts, doubling sleep) and the backoff loop in
  * `scripts/base_model.py:47-72`.
  *
  * The connection-error heuristic mirrors what the reference treats as
  * retryable: timeouts, refused/reset connections, and the SQL "transient"
  * exception family — anything else (analysis errors, constraint violations,
  * OOM) fails immediately, because retrying a deterministic failure just
  * triples its latency.
  */
object Retry {

  /** @param maxAttempts    total tries (1 = no retry)
    * @param initialDelayMs sleep before attempt 2; doubles per attempt
    * @param isTransient    retry gate; default = connection-error heuristic
    * @param sleep          injectable for tests (no real backoff in specs) */
  final case class Policy(maxAttempts: Int = 3,
                          initialDelayMs: Long = 1000L,
                          isTransient: Throwable => Boolean = defaultTransient,
                          sleep: Long => Unit = Thread.sleep) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
  }

  /** No-retry policy: single attempt, failures propagate untouched. */
  val none: Policy = Policy(maxAttempts = 1)

  /** Connection-error heuristic (`hanger_lane.py:624-644` probes the source
    * and branches on "is this a connectivity problem"): class-based for the
    * JDK/JDBC families, message-based for driver-wrapped causes. */
  def defaultTransient(e: Throwable): Boolean = {
    def classy(t: Throwable): Boolean = t match {
      case null => false
      case _: java.net.SocketTimeoutException => true
      case _: java.net.ConnectException => true
      case _: java.net.UnknownHostException => true
      case _: java.sql.SQLTransientException => true
      case _: java.sql.SQLRecoverableException => true
      case _: java.io.InterruptedIOException => true
      case other =>
        val msg = Option(other.getMessage).getOrElse("").toLowerCase
        Seq("connection reset", "connection refused", "connection timed out",
          "broken pipe", "timeout expired", "temporarily unavailable")
          .exists(msg.contains) || classy(other.getCause)
    }
    classy(e)
  }

  /** Run `body`, retrying transient failures up to `policy.maxAttempts` with
    * doubling backoff. Non-transient failures and the final attempt's failure
    * propagate. Returns the value plus the attempt count (1-based). */
  def withRetry[T](policy: Policy)(body: => T): (T, Int) = {
    @tailrec
    def go(attempt: Int, delayMs: Long): (T, Int) = {
      val result =
        try Right(body)
        catch {
          case e: Throwable
            if attempt < policy.maxAttempts && policy.isTransient(e) => Left(e)
        }
      result match {
        case Right(v) => (v, attempt)
        case Left(_) =>
          policy.sleep(delayMs)
          go(attempt + 1, delayMs * 2)
      }
    }
    go(1, policy.initialDelayMs)
  }
}
