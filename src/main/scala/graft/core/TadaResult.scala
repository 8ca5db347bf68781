package graft.core

/** Error-poisoning chain (SURVEY §7.4.7): the reference attaches errors
  * to frames and poisons downstream ops until `Err()` is checked
  * (internal.go:42-90). Spark raises at action time instead; this thin
  * combinator restores the deferred-check style for test-driven
  * pipelines — each step runs only if every prior step succeeded, and
  * the first failure is carried to the final `err`/`get` check.
  *
  * {{{
  * val r = TadaResult(frame).map(_.dropNull("score")).map(_.sort(...))
  * r.err  // Option[Throwable] — the tada Err() check
  * }}}
  */
final case class TadaResult(result: Either[Throwable, TadaFrame]) {
  def map(f: TadaFrame => TadaFrame): TadaResult =
    TadaResult(result.flatMap(fr =>
      try Right(f(fr)) catch { case e: Throwable => Left(e) }))

  def err: Option[Throwable] = result.left.toOption
  def get: TadaFrame = result.fold(throw _, identity)
}

object TadaResult {
  def apply(f: TadaFrame): TadaResult = TadaResult(Right(f))
  def attempt(f: => TadaFrame): TadaResult =
    TadaResult(try Right(f) catch { case e: Throwable => Left(e) })
}
