package graft.telemetry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** LLM interpretation service — reference parity with X4
  * (streamlit_app.py:1090-1212, 1261-1272): collect small analytic context
  * frames → canonical JSON → chat-completion client, with a per-session run
  * cap, content-hash memoization (sha2 of the canonical JSON, F16) and TTL.
  *
  * This is a DRIVER-SIDE effect by design (SURVEY §3.3): the network call
  * must never ride inside an executor-side UDF. The client is injected; the
  * default [[StubClient]] is deterministic so tests need no network (this
  * environment has zero egress).
  */
object Summarizer {

  /** Chat client boundary (temperature/max-tokens mirror the reference's
    * cost-control defaults: 0.2 / 700 — BASELINE.md LLM budget row).
    */
  trait LlmClient {
    def complete(prompt: String, temperature: Double = 0.2, maxTokens: Int = 700): String
  }

  /** Deterministic offline stub: echoes a digest of the context. */
  final class StubClient extends LlmClient {
    override def complete(prompt: String, temperature: Double, maxTokens: Int): String =
      s"[stub-summary sha=${prompt.hashCode.toHexString} len=${prompt.length}]"
  }

  /** Pluggable HTTP chat-completions client (the OpenAI-compatible wire
    * shape the reference's providers all speak) on the JDK `HttpClient` —
    * no new dependencies. Endpoint, key and model are injected; the
    * request body and response parsing are PURE functions
    * ([[buildRequestBody]]/[[parseContent]]) so the protocol logic is
    * spec-tested without any network (this environment has zero egress —
    * `complete` itself is exercised only in a live deployment).
    */
  final class HttpJsonClient(endpoint: String, apiKey: String, model: String,
                             timeoutMs: Long = 30000L) extends LlmClient {
    private def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    /** Chat-completions request envelope; prompt rides as the single user
      * message. Public for spec coverage.
      */
    def buildRequestBody(prompt: String, temperature: Double, maxTokens: Int): String =
      s"""{"model":"${esc(model)}","temperature":$temperature,""" +
        s""""max_tokens":$maxTokens,""" +
        s""""messages":[{"role":"user","content":"${esc(prompt)}"}]}"""

    /** Extracts `choices[0].message.content` from the standard response
      * envelope: finds the first `"content"` key and decodes the JSON
      * string that follows (escape-aware). Errors loudly on a shape it
      * doesn't recognize rather than returning a fragment. Public for
      * spec coverage.
      */
    def parseContent(responseJson: String): String = {
      val key = "\"content\""
      val at = responseJson.indexOf(key)
      require(at >= 0, "LLM response has no content field")
      val colon = responseJson.indexOf(':', at + key.length)
      require(colon >= 0, "LLM response content key has no value")
      // the value must BE a string literal: skip whitespace after the colon
      // and demand an opening quote there. Scanning ahead for "the next
      // quote anywhere" would latch onto an unrelated token when content is
      // null (tool-call / refusal envelopes) or an object.
      var i = colon + 1
      while (i < responseJson.length && responseJson.charAt(i).isWhitespace) i += 1
      require(i < responseJson.length && responseJson.charAt(i) == '"',
        "LLM response content is not a string (null/object content rejected)")
      i += 1
      val out = new StringBuilder
      while (i < responseJson.length && responseJson.charAt(i) != '"') {
        responseJson.charAt(i) match {
          case '\\' =>
            require(i + 1 < responseJson.length, "truncated escape in content")
            responseJson.charAt(i + 1) match {
              case 'n' => out += '\n'; i += 2
              case 't' => out += '\t'; i += 2
              case 'r' => out += '\r'; i += 2
              case 'b' => out += '\b'; i += 2
              case 'f' => out += '\f'; i += 2
              case 'u' =>
                out += Integer.parseInt(responseJson.substring(i + 2, i + 6), 16).toChar
                i += 6
              case c @ ('"' | '\\' | '/') => out += c; i += 2
              case c =>
                // JSON defines exactly the escapes above; anything else is
                // a malformed envelope — error loudly, per the contract
                throw new IllegalArgumentException(
                  s"unsupported escape \\$c in LLM content")
            }
          case c => out += c; i += 1
        }
      }
      require(i < responseJson.length, "unterminated content string")
      out.toString
    }

    override def complete(prompt: String, temperature: Double, maxTokens: Int): String = {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer $apiKey")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          buildRequestBody(prompt, temperature, maxTokens)))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"LLM endpoint returned ${resp.statusCode()}")
      parseContent(resp.body())
    }
  }

  final case class Config(maxRunsPerSession: Int = 10, cacheTtlMs: Long = 600000L)

  /** Collects chart-sized context frames to a canonical JSON payload.
    * `to_json(struct(...))` keeps serialization on the engine side; only
    * the (small) JSON strings cross to the driver.
    */
  def buildContext(frames: Map[String, DataFrame], maxRowsPerFrame: Int = 50): String =
    frames.toSeq.sortBy(_._1).map { case (name, df) =>
      // Deterministic orderBy before limit: an unordered limit can return a
      // different row subset per run on multi-partition frames, which would
      // change the sha2 memo key for identical logical input (defeating the
      // cache and burning run-cap slots). Only orderable columns participate
      // (a MapType column would make orderBy throw); a frame with NO
      // orderable column falls back to the bare limit.
      val orderable = df.schema.fields.filter(f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
        .map(f => col(f.name)).toSeq
      val bounded =
        if (orderable.nonEmpty) df.orderBy(orderable: _*).limit(maxRowsPerFrame)
        else df.limit(maxRowsPerFrame)
      val rows = bounded
        .select(to_json(struct(df.columns.map(col).toSeq: _*)).as("j"))
        .collect().map(_.getString(0))
      s""""$name": [${rows.mkString(",")}]"""
    }.mkString("{", ",", "}")

  /** F16: content-addressed memo key — sha2-256 of the canonical JSON,
    * computed through the engine (one-row frame) to use the same sha2
    * implementation the distributed path would.
    */
  def contextHash(spark: SparkSession, contextJson: String): String = {
    import spark.implicits._
    Seq(contextJson).toDF("c").select(sha2(col("c"), 256)).first().getString(0)
  }

  /** Session-scoped summarizer with the reference's run cap + memo cache.
    * `now` is injected for testability (no wall-clock in logic).
    */
  final class Service(spark: SparkSession, client: LlmClient,
                      config: Config = Config(), now: () => Long) {
    private var runs = 0
    private val cache = mutable.Map.empty[String, (Long, String)]

    def summarize(frames: Map[String, DataFrame]): Option[String] = {
      val ctx = buildContext(frames)
      val key = contextHash(spark, ctx)
      val t = now()
      cache.get(key).filter { case (at, _) => t - at < config.cacheTtlMs } match {
        case Some((_, cached)) => Some(cached)
        case None if runs >= config.maxRunsPerSession => None
        case None =>
          runs += 1
          val out = client.complete(s"Summarize this network telemetry context: $ctx")
          cache.update(key, (t, out))
          Some(out)
      }
    }

    def runsUsed: Int = runs
  }
}
