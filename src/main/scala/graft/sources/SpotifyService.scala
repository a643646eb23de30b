package graft.sources

/** The remote-API seam (reference `spotify_client.py`): everything the
  * paged source and the batched feature lookup need from the live
  * service, as one swappable trait.
  *
  *  - `connect`      — the OAuth2 handshake hook (spotify_client.py:
  *                     52-85 builds an authorized session from client
  *                     id/secret/redirect config). Implementations
  *                     receive the reader options verbatim; the fake
  *                     ignores them, an HTTP impl exchanges them for a
  *                     token. Called once per partition reader — the
  *                     per-executor analog of the reference's one
  *                     session per process.
  *  - `probeTotal`   — the limit=1 total probe (spotify_client.py:
  *                     527-529), called once at PLANNING time.
  *  - `page`         — one search page (offset, limit) ->  rows
  *                     (spotify_client.py:204-245); empty past the end
  *                     (the loop-until-empty contract, README.md:
  *                     148-149 — the reference does not trust `total`).
  *  - `featureBatch` — point lookup of <= 50 ids per call
  *                     (spotify_client.py:431-467).
  *
  * Implementations must be `Serializable` (instances ride the closure
  * into `BatchedLookup`) and have either a no-arg constructor or be a
  * Scala `object` (the DataSourceV2 path re-resolves them from a class
  * name on the executor side — V2 options are strings).
  */
trait SpotifyService extends Serializable {
  def connect(options: Map[String, String]): Unit = ()
  def probeTotal(configuredTotal: Int): Int
  def page(offset: Int, limit: Int, total: Int): Seq[(Long, String, String, Int)]
  def featureBatch(ids: Seq[Long]): Seq[(Long, Double)]

  /** One search page with a server-side category filter — the analog
    * of passing the filter term inside the API request (the reference
    * builds search query strings the same way, spotify_client.py:
    * 204-245), which is what Spark's V2 filter pushdown hands the
    * source. Default: client-side post-filter, so existing
    * implementations stay correct; a real API impl overrides to put
    * the term in the request and ship fewer bytes.
    */
  def pageFiltered(offset: Int, limit: Int, total: Int,
      category: Option[String]): Seq[(Long, String, String, Int)] =
    category match {
      case Some(c) => page(offset, limit, total).filter(_._3 == c)
      case None => page(offset, limit, total)
    }
}

object SpotifyService {
  /** Instantiate an implementation from its fully-qualified name: a
    * Scala `object` (singleton MODULE$) or a no-arg class.
    */
  def resolve(className: String): SpotifyService = {
    val cls =
      try Class.forName(className + "$")
      catch { case _: ClassNotFoundException => Class.forName(className) }
    val inst =
      if (cls.getName.endsWith("$")) cls.getField("MODULE$").get(null)
      else cls.getDeclaredConstructor().newInstance()
    inst.asInstanceOf[SpotifyService]
  }
}
