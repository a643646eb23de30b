package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Offline model of the reference's OAuth2 token lifecycle
  * (spotify_client.py:52-85): `SpotifyOAuth` exchanges client
  * id/secret for an access token, caches it (config/.cache), silently
  * refreshes it when it expires, and — when the refresh token itself
  * has been revoked (`SpotifyOauthError: invalid_grant, 'Refresh token
  * revoked'`) — deletes the cache and redoes the full exchange. The
  * container has zero egress, so the token SERVER here is an
  * in-process fake ([[FakeTokenEndpoint]]), but the CLIENT state
  * machine ([[OAuth2Session]]) is the real contract a live HTTP
  * implementation drops into: a user swapping in spotipy-over-HTTP
  * implements [[TokenEndpoint]] and keeps the session, cache, and
  * error handling unchanged.
  *
  * Expiry is measured in resource-server CALLS, not wall-clock time,
  * so tests are deterministic and a token reliably dies mid-pagination
  * regardless of machine speed.
  */
class OAuth2Error(message: String) extends RuntimeException(message)

/** An issued bearer token. `expiresAtCall` is server-side state (the
  * client learns of expiry the way HTTP clients do: a 401 on use).
  */
final case class AccessToken(value: String, refreshToken: String)

/** The token-server contract: authorization-code/client-credentials
  * exchange, refresh-grant, and the resource server's bearer check.
  */
trait TokenEndpoint extends Serializable {
  /** Full credential exchange (the SpotifyOAuth handshake). Throws
    * `invalid_client` on bad credentials.
    */
  def exchange(clientId: String, clientSecret: String): AccessToken
  /** Refresh grant. Throws `invalid_grant` when the refresh token has
    * been revoked (the reference's "Refresh token revoked" path).
    */
  def refresh(clientId: String, refreshToken: String): AccessToken
  /** Resource-server bearer check, consuming one API call. Throws
    * `token_expired` (the 401 analog) when the token has aged out.
    */
  def authorize(tokenValue: String): Unit
}

/** The config/.cache analog: issued tokens shared across connects in
  * this JVM (the reference caches to a file so every process reuses
  * the token; here every PARTITION READER's connect() reuses it, so a
  * 1000-reader scan does one exchange, not 1000).
  */
object TokenCache {
  private val cache = new ConcurrentHashMap[String, AccessToken]()
  def get(clientId: String): Option[AccessToken] = Option(cache.get(clientId))
  def put(clientId: String, token: AccessToken): Unit = cache.put(clientId, token)
  def clear(clientId: String): Unit = cache.remove(clientId)
  def clearAll(): Unit = cache.clear()
}

/** Client-side auth state machine (the spotipy auth-manager analog).
  * `call(f)` runs an API action under a valid bearer token:
  *
  *  1. use the cached token (or exchange credentials for a first one);
  *  2. on `token_expired` (401): refresh, cache, retry once;
  *  3. on `invalid_grant` during that refresh (refresh token revoked):
  *     clear the cache and redo the FULL exchange — the reference's
  *     cache_path.unlink + reconnect fallback — then retry.
  *
  * Concurrent refreshes (several partition readers hitting expiry at
  * once) are benign: each gets a valid token, last cache write wins.
  */
class OAuth2Session(endpoint: TokenEndpoint, clientId: String,
    clientSecret: String) extends Serializable {

  private def currentToken(): AccessToken =
    TokenCache.get(clientId).getOrElse {
      val t = endpoint.exchange(clientId, clientSecret)
      TokenCache.put(clientId, t)
      t
    }

  /** Bounded, not single-shot: under concurrent readers another
    * thread's traffic can age a just-refreshed token before this
    * thread presents it, so one retry is not enough — real HTTP
    * clients loop exactly like this.
    */
  def call[T](f: String => T): T = {
    var attempt = 0
    while (attempt < OAuth2Session.MaxAuthRetries) {
      val tok = currentToken()
      try return f(tok.value)
      catch {
        case e: OAuth2Error if e.getMessage.startsWith("token_expired") =>
          attempt += 1
          val fresh =
            try endpoint.refresh(clientId, tok.refreshToken)
            catch {
              case e2: OAuth2Error if e2.getMessage.startsWith("invalid_grant") =>
                // refresh token revoked: drop the cache, full re-auth
                TokenCache.clear(clientId)
                endpoint.exchange(clientId, clientSecret)
            }
          TokenCache.put(clientId, fresh)
      }
    }
    throw new OAuth2Error(
      s"token_expired: still rejected after ${OAuth2Session.MaxAuthRetries} refresh attempts")
  }
}

object OAuth2Session {
  private[sources] val MaxAuthRetries = 32
}

/** Deterministic offline token server. One registered app
  * (demo-client/demo-secret); tokens live for `ttlCalls` authorize
  * calls; a refresh-token lineage survives `maxRefreshes` refreshes
  * before the grant is revoked and a full exchange is forced.
  * Counters are test observability (PagedSourceSpec asserts a scan
  * actually refreshed mid-flight).
  */
object FakeTokenEndpoint extends TokenEndpoint {
  @volatile private var ttlCalls: Long = Long.MaxValue
  @volatile private var maxRefreshes: Int = Int.MaxValue
  private val registeredApps = Map("demo-client" -> "demo-secret")

  val calls = new AtomicLong(0)
  val exchanges = new AtomicLong(0)
  val refreshes = new AtomicLong(0)
  // server-side token store: value -> call count at which it expires
  private val issued = new ConcurrentHashMap[String, Long]()

  /** Reconfigure + wipe all server and client-cache state (tests). */
  def reset(ttlCalls: Long = Long.MaxValue, maxRefreshes: Int = Int.MaxValue): Unit = {
    this.ttlCalls = ttlCalls
    this.maxRefreshes = maxRefreshes
    calls.set(0); exchanges.set(0); refreshes.set(0)
    issued.clear()
    TokenCache.clearAll()
  }

  private def issue(clientId: String, generation: Int): AccessToken = {
    val value = s"at-$clientId-${exchanges.get()}-${refreshes.get()}"
    issued.put(value, calls.get() + ttlCalls)
    AccessToken(value, s"rt-$clientId-$generation")
  }

  override def exchange(clientId: String, clientSecret: String): AccessToken = {
    if (!registeredApps.get(clientId).contains(clientSecret))
      throw new OAuth2Error(s"invalid_client: unknown client id/secret for $clientId")
    exchanges.incrementAndGet()
    issue(clientId, generation = 0)
  }

  override def refresh(clientId: String, refreshToken: String): AccessToken = {
    val generation = refreshToken.substring(refreshToken.lastIndexOf('-') + 1).toInt
    if (generation >= maxRefreshes)
      throw new OAuth2Error("invalid_grant: Refresh token revoked")
    refreshes.incrementAndGet()
    issue(clientId, generation + 1)
  }

  override def authorize(tokenValue: String): Unit = {
    val now = calls.incrementAndGet()
    // unknown token -> MinValue, always rejected (a missing CHM key
    // would otherwise unbox null to 0L and lean on `now` being > 0)
    val expiry = issued.getOrDefault(tokenValue, Long.MinValue)
    if (now > expiry)
      throw new OAuth2Error(s"token_expired: bearer token rejected at call $now")
  }
}

/** A [[SpotifyService]] whose every API call runs through the full
  * OAuth2 lifecycle — the same rows as [[FakeApi]], but each page and
  * feature batch presents a bearer token that the fake server may
  * reject mid-scan, exercising connect / refresh / revoked-grant
  * re-auth through the seam. Swap a live [[TokenEndpoint]] in and this
  * object IS the HTTP client's auth skeleton.
  */
object TokenIssuingFakeApi extends SpotifyService {
  @volatile private var session: OAuth2Session =
    new OAuth2Session(FakeTokenEndpoint, "demo-client", "demo-secret")

  override def connect(options: Map[String, String]): Unit = {
    // V2 option keys arrive lower-cased
    val id = options.getOrElse("client_id", "demo-client")
    val secret = options.getOrElse("client_secret", "demo-secret")
    session = new OAuth2Session(FakeTokenEndpoint, id, secret)
    // the reference proves the handshake with a test API call
    // (client.categories(), spotify_client.py:76-78)
    session.call(FakeTokenEndpoint.authorize)
  }

  override def probeTotal(configuredTotal: Int): Int =
    session.call { tok =>
      FakeTokenEndpoint.authorize(tok)
      FakeApi.probeTotal(configuredTotal)
    }

  override def page(offset: Int, limit: Int, total: Int): Seq[(Long, String, String, Int)] =
    session.call { tok =>
      FakeTokenEndpoint.authorize(tok)
      FakeApi.page(offset, limit, total)
    }

  override def featureBatch(ids: Seq[Long]): Seq[(Long, Double)] =
    session.call { tok =>
      FakeTokenEndpoint.authorize(tok)
      FakeApi.featureBatch(ids)
    }
}
