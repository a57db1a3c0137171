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

  /** JSON string-literal escaping shared by both wire clients. */
  private[telemetry] def escJson(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Decodes the JSON string literal that is the value of the first
    * occurrence of `"key"` at/after `from` — shared extraction kernel of
    * [[HttpJsonClient.parseContent]] and [[GeminiClient.parseText]].
    * Demands an actual string literal right after the colon (whitespace
    * permitted): `null` / object / array values are rejected loudly
    * instead of latching onto the next quote in the document.
    */
  private[telemetry] def decodeStringValue(json: String, key: String,
      from: Int = 0): String = {
    val at = json.indexOf("\"" + key + "\"", from)
    require(at >= 0, s"response has no $key field")
    val colon = json.indexOf(':', at + key.length + 2)
    require(colon >= 0, s"response $key key has no value")
    var i = colon + 1
    while (i < json.length && json.charAt(i).isWhitespace) i += 1
    require(i < json.length && json.charAt(i) == '"',
      s"response $key is not a string (null/object content rejected)")
    i += 1
    val out = new StringBuilder
    while (i < json.length && json.charAt(i) != '"') {
      json.charAt(i) match {
        case '\\' =>
          require(i + 1 < json.length, s"truncated escape in $key")
          json.charAt(i + 1) match {
            case 'n' => out += '\n'; i += 2
            case 't' => out += '\t'; i += 2
            case 'r' => out += '\r'; i += 2
            case 'b' => out += '\b'; i += 2
            case 'f' => out += '\f'; i += 2
            case 'u' =>
              require(i + 6 <= json.length, s"truncated \\u escape in $key")
              out += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c @ ('"' | '\\' | '/') => out += c; i += 2
            case c =>
              // JSON defines exactly the escapes above; anything else is
              // a malformed envelope — error loudly, per the contract
              throw new IllegalArgumentException(
                s"unsupported escape \\$c in $key")
          }
        case c => out += c; i += 1
      }
    }
    require(i < json.length, s"unterminated $key string")
    out.toString
  }

  /** Pluggable HTTP chat-completions client (the OpenAI-compatible wire
    * shape — the reference's `provider == "openai"` path,
    * streamlit_app.py:1178-1192) on the JDK `HttpClient` — no new
    * dependencies. Endpoint, key and model are injected; the request
    * body and response parsing are PURE functions
    * ([[buildRequestBody]]/[[parseContent]]) so the protocol logic is
    * spec-tested without any network (this environment has zero egress —
    * `complete` itself is exercised only in a live deployment).
    */
  final class HttpJsonClient(endpoint: String, apiKey: String, model: String,
                             timeoutMs: Long = 30000L) extends LlmClient {
    private def esc(s: String): String = escJson(s)

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
    def parseContent(responseJson: String): String =
      decodeStringValue(responseJson, "content")

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

  /** Gemini-native `generateContent` client — the reference's DEFAULT
    * provider path (streamlit_app.py:1168-1177 calls
    * `GenerativeModel(model).generate_content([system, user])`; the
    * provider selectbox at :1218 defaults to "gemini"). Speaks the
    * public REST wire shape of that SDK call: POST
    * `{base}/models/{model}:generateContent` with the prompt as user
    * parts and `generationConfig` carrying temperature/maxOutputTokens;
    * the reply text sits at `candidates[0].content.parts[0].text`.
    * Request build and response parse are PURE functions, spec-tested
    * with zero network, like [[HttpJsonClient]]'s.
    */
  final class GeminiClient(apiKey: String, model: String,
      base: String = "https://generativelanguage.googleapis.com/v1beta",
      timeoutMs: Long = 30000L) extends LlmClient {

    /** Resolved request URL — pure, public for spec coverage. The key
      * travels in the `x-goog-api-key` header, never the URL (URLs leak
      * into logs).
      */
    def requestUrl: String = s"$base/models/$model:generateContent"

    /** generateContent envelope. The reference passes `[system, user]`
      * as one content list; our Service sends a single prompt, which
      * rides as one user part — `parts` takes N texts for callers that
      * split system/user like the reference does.
      */
    def buildRequestBody(parts: Seq[String], temperature: Double,
        maxTokens: Int): String = {
      require(parts.nonEmpty, "generateContent needs at least one part")
      val ps = parts.map(p => s"""{"text":"${escJson(p)}"}""").mkString(",")
      s"""{"contents":[{"role":"user","parts":[$ps]}],""" +
        s""""generationConfig":{"temperature":$temperature,""" +
        s""""maxOutputTokens":$maxTokens}}"""
    }

    /** Extracts the reply text of `candidates[0].content.parts`,
      * concatenating every text part (multi-part replies are one logical
      * message on this wire). The search is ANCHORED down the real path —
      * `candidates` → `content` → `parts` → the bracket-matched array —
      * not "first `text` key after `candidates`": a candidate whose
      * parts open with a `functionCall` (whose args may carry `text`
      * fields), or `text`-named fields in candidate metadata, must not
      * be mis-extracted. A response with no `candidates` array
      * (safety-blocked prompts return only `promptFeedback`) errors
      * loudly with the block reason when one is present, and a parts
      * array carrying no text part errors loudly too, mirroring the
      * strictness of [[HttpJsonClient.parseContent]].
      */
    def parseText(responseJson: String): String = {
      val cand = responseJson.indexOf("\"candidates\"")
      if (cand < 0) {
        val reason =
          try Some(decodeStringValue(responseJson, "blockReason"))
          catch { case _: IllegalArgumentException => None }
        throw new IllegalArgumentException(
          reason.fold("Gemini response has no candidates")(r =>
            s"Gemini prompt blocked: $r"))
      }
      val content = responseJson.indexOf("\"content\"", cand)
      require(content >= 0, "Gemini candidate has no content")
      val parts = responseJson.indexOf("\"parts\"", content)
      require(parts >= 0, "Gemini content has no parts")
      val open = responseJson.indexOf('[', parts)
      require(open >= 0, "Gemini parts is not an array")
      // bracket-matched, string-aware walk of exactly the parts array:
      // string literals are skipped atomically (so braces/keys inside
      // reply text can't confuse the depth count), and a "text" string
      // counts only when it is a KEY (next non-space char is ':') at
      // any depth inside the array — part objects hold text at depth 2;
      // deeper "text" keys belong to non-text parts like functionCall
      // args and are excluded by requiring depth == 2
      var i = open
      var depth = 0
      var end = -1
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (end < 0 && i < responseJson.length) {
        responseJson.charAt(i) match {
          case '"' =>
            val keyAt = i
            val isTextLiteral = responseJson.startsWith("\"text\"", i)
            i += 1
            while (i < responseJson.length && responseJson.charAt(i) != '"') {
              if (responseJson.charAt(i) == '\\') i += 1
              i += 1
            }
            require(i < responseJson.length, "unterminated string in Gemini parts")
            i += 1
            if (isTextLiteral && depth == 2) {
              var j = i
              while (j < responseJson.length && responseJson.charAt(j).isWhitespace) j += 1
              if (j < responseJson.length && responseJson.charAt(j) == ':')
                texts += decodeStringValue(responseJson, "text", keyAt)
            }
          case '[' | '{' => depth += 1; i += 1
          case ']' | '}' => depth -= 1; if (depth == 0) end = i else i += 1
          case _ => i += 1
        }
      }
      require(end >= 0, "unterminated Gemini parts array")
      require(texts.nonEmpty,
        "Gemini candidate carries no text part (functionCall or empty reply)")
      texts.mkString
    }

    override def complete(prompt: String, temperature: Double, maxTokens: Int): String = {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(requestUrl))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .header("x-goog-api-key", apiKey)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          buildRequestBody(Seq(prompt), temperature, maxTokens)))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"Gemini endpoint returned ${resp.statusCode()}")
      parseText(resp.body())
    }
  }

  /** Provider toggle, matching the reference's selectbox semantics
    * (streamlit_app.py:1218-1224: "gemini" default with model
    * gemini-1.5-flash, "openai" with gpt-4o-mini, anything else is an
    * error). `endpoint` applies to the openai-compatible path only.
    */
  def client(provider: String, apiKey: String, model: String = "",
      endpoint: String = "https://api.openai.com/v1/chat/completions"): LlmClient =
    provider match {
      case "gemini" =>
        new GeminiClient(apiKey, if (model.isEmpty) "gemini-1.5-flash" else model)
      case "openai" =>
        new HttpJsonClient(endpoint, apiKey, if (model.isEmpty) "gpt-4o-mini" else model)
      case other =>
        throw new IllegalArgumentException(s"unknown LLM provider: $other")
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
