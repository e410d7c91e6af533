package graft.workflow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Secrets layer — the engine-side re-expression of the reference's
  * secrets utility (/root/reference/utils/secrets_manger.py:18-135 and its
  * config integration, /root/reference/core/config.py): one secret NAME
  * selected by environment (dev/prod secrets carry the SAME keys with
  * different values), a JSON key→value document behind it, per-process
  * caching, and fail-soft per-key reads that fall back to a default — the
  * reference's own behavior when its (dead, import-typo'd) AWS path is
  * unreachable is to run on env vars, so fallback IS the contract.
  *
  * The store itself is a seam ([[Secrets.Provider]]) with two shipped
  * impls and no cloud SDK (zero-egress build; a deployer drops an
  * AWS/GCP/Vault provider behind the same trait):
  *
  *   - [[Secrets.EnvProvider]]: reads process environment — the
  *     reference's effective production path.
  *   - [[Secrets.JsonFileProvider]]: reads a flat JSON object from a
  *     file (the mounted-k8s-Secret / localstack shape, and exactly the
  *     SecretString document the reference parses at
  *     secrets_manger.py:70-74). Parsed once, cached.
  *
  * [[Secrets.chain]] composes providers first-hit-wins (env over file is
  * the reference's precedence: explicit env always overrides the
  * secret document).
  */
object Secrets {

  /** One secret source. `get` returns None for an absent key; lookup
    * failures inside a provider surface as None too (fail-soft per key —
    * the caller decides between `getOrElse` and [[require]]). */
  trait Provider { def get(key: String): Option[String] }

  /** Process-environment provider (injectable for tests). */
  final class EnvProvider(env: Map[String, String] = sys.env)
      extends Provider {
    def get(key: String): Option[String] = env.get(key)
  }

  /** Flat-JSON-document provider: `{"REDSHIFT_HOST": "...", ...}` — the
    * SecretString shape. The file is read and parsed ONCE (the
    * reference's `_cached_secret`); a missing or malformed file yields
    * an empty document (fail-soft: the chain's later providers and
    * defaults take over, mirroring the reference's catch-and-default at
    * secrets_manger.py:107-135). */
  final class JsonFileProvider(path: String) extends Provider {
    private lazy val doc: Map[String, String] = parse()

    private def parse(): Map[String, String] = {
      val p = Paths.get(path)
      if (!Files.exists(p)) return Map.empty
      try parseFlatJson(new String(Files.readAllBytes(p),
        StandardCharsets.UTF_8))
      catch { case _: Exception => Map.empty }
    }

    def get(key: String): Option[String] = doc.get(key)
  }

  /** First-hit-wins composition. */
  def chain(providers: Provider*): Provider = new Provider {
    def get(key: String): Option[String] =
      providers.iterator.flatMap(_.get(key)).nextOption()
  }

  /** The reference's environment-aware secret selection
    * (secrets_manger.py:33-36 + module doc): the secret NAME comes from
    * `GRAFT_SECRET_FILE` (their `AWS_SECRET_NAME`), dev/prod documents
    * share a key schema. Env vars override the document. */
  def standard(env: Map[String, String] = sys.env): Provider = {
    val file = env.getOrElse("GRAFT_SECRET_FILE", "")
    if (file.isEmpty) new EnvProvider(env)
    else chain(new EnvProvider(env), new JsonFileProvider(file))
  }

  /** Hard-required key: the loud counterpart of the reference's silent
    * default (for credentials where running without one is worse than
    * failing). */
  def require(p: Provider, key: String): String =
    p.get(key).getOrElse(throw new IllegalStateException(
      s"required secret '$key' not found in any provider"))

  /** Render a secret for logs — always exactly 8 asterisks, never the
    * value (secrets_manger.py:118) and never the LENGTH either: a
    * length-proportional mask leaks how short a weak secret is. */
  def masked(value: String): String = "********"

  /** Minimal flat-JSON-object parser (string values only, escapes
    * honored) — the engine has no JSON dependency by design and the
    * SecretString contract is exactly a flat string map; nested values
    * are rejected by the same parse-failure → empty-document rule. */
  private[workflow] def parseFlatJson(s: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    val n = s.length
    def skipWs(): Unit = { while (i < n && s.charAt(i).isWhitespace) i += 1 }
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= n || s.charAt(i) != c)
        throw new IllegalArgumentException(s"expected '$c' at $i")
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < n) {
          i += 1
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16)
                .toChar)
              i += 4
            case other =>
              throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.result()
    }
    expect('{')
    skipWs()
    if (i < n && s.charAt(i) == '}') { i += 1; return out.toMap }
    var more = true
    while (more) {
      val k = parseString()
      expect(':')
      val v = parseString()
      out(k) = v
      skipWs()
      if (i < n && s.charAt(i) == ',') { i += 1; skipWs() }
      else more = false
    }
    expect('}')
    skipWs()
    if (i != n) throw new IllegalArgumentException("trailing content")
    out.toMap
  }
}
