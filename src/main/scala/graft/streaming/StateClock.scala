package graft.streaming

/** The ONE monotone event-time state-expiry computation shared by every
  * stateful gate that hand-rolls a TTL over `flatMapGroupsWithState`
  * ([[DocsStream.quotaGate]], [[EmbStream.semanticDedupGate]],
  * [[EventsStream.sessionize]]): expire `ttlMs` after the group's latest
  * arrival EVER seen (the caller's state carries the running-max clock —
  * GroupState exposes no current timeout, so a late-but-valid batch must
  * never shorten a previously-set expiry), clamped strictly past the
  * current watermark (Spark rejects a timeout at or before it, i.e. a TTL
  * shorter than the watermark delay).
  *
  * Centralized so lifecycle fixes land once: the addition saturates at
  * Long.MaxValue instead of wrapping negative for a caller that encodes
  * "never" as a huge TTL — a wrapped sum would expire the state
  * immediately, silently converting lifetime state into per-batch state.
  */
private[streaming] object StateClock {
  def monotoneTimeoutMs(maxEventTimeMs: Long, ttlMs: Long, watermarkMs: Long): Long = {
    val raw = maxEventTimeMs + ttlMs
    val expiry = if (ttlMs > 0 && raw < maxEventTimeMs) Long.MaxValue else raw
    math.max(expiry, watermarkMs + 1)
  }
}
