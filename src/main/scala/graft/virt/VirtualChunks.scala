package graft.virt

import graft.storage.{AzureStoreConf, GcsStoreConf, HttpStoreConf,
  LocalStoreConf, S3StoreConf, StoreConf}

/** Explicit no-credential access sentinels (#2194, reference
  * `icechunk.credentials.LocalFileSystemAccess` / `HttpAccess` /
  * `*_anonymous_credentials`): a container that needs no credentials
  * must SAY so — a container registered with neither a [[StoreConf]]
  * nor one of these is refused by name at set-time and fetch-time,
  * never silently fetched anonymously.
  */
sealed trait VirtualAccess extends Serializable {
  /** Which location schemes this sentinel authorizes. */
  def covers(location: String): Boolean
}
/** `file:` locations via the local filesystem. */
case object LocalFileSystemAccess extends VirtualAccess {
  def covers(l: String): Boolean = l.startsWith("file:")
}
/** Plain unauthenticated `http(s)://` GETs. */
case object HttpAccess extends VirtualAccess {
  def covers(l: String): Boolean =
    l.startsWith("http://") || l.startsWith("https://")
}
/** Anonymous access through any supported scheme (the
  * `s3_anonymous_credentials()`-style opt-in, scheme-generic).
  */
case object AnonymousAccess extends VirtualAccess {
  def covers(l: String): Boolean = true
}

/** Virtual chunk containers: registered external URL prefixes whose files
  * hold chunk bytes (virtual_chunks.rs:96-110). Locations are matched to a
  * container by longest-prefix (`matching_container`,
  * virtual_chunks.rs:383-458); unauthorized locations are rejected at
  * set-time (session.rs:631-655).
  *
  * A container may carry its own [[StoreConf]] — per-container object-store
  * credentials/endpoint, the reference's per-container config model
  * (virtual_chunks.rs:122-180). Locations under such a prefix are fetched
  * through a cached store client (ranged GETs, one connection pool per
  * executor JVM) instead of the generic scheme dispatch. A container
  * without a store must carry an explicit [[VirtualAccess]] sentinel
  * (#2194) — registration alone does not authorize anonymous fetch.
  */
final case class VirtualChunkContainer(urlPrefix: String,
                                       name: String = "",
                                       store: Option[StoreConf] = None,
                                       access: Option[VirtualAccess] = None) {
  private[virt] def displayName: String =
    if (name.nonEmpty) s"'$name' ($urlPrefix)" else s"'$urlPrefix'"
}

final class VirtualChunkResolver(val containers: Seq[VirtualChunkContainer])
    extends Serializable {
  /** name → prefix map (legacy descriptor; prefer shipping the resolver). */
  def containerMap: Map[String, String] =
    containers.filter(_.name.nonEmpty).map(c => c.name -> c.urlPrefix).toMap

  def matchingContainer(location: String): Option[VirtualChunkContainer] =
    containers.filter(c => location.startsWith(c.urlPrefix))
      .sortBy(-_.urlPrefix.length).headOption

  /** Expand relative `vcc://<container>/<relpath>` locations against the
    * named container's prefix (`VirtualChunkLocation::from_vcc_path` /
    * `expand_location`, manifest.rs:284-433, virtual_chunks.rs:409).
    * Absolute locations pass through unchanged.
    */
  /** Expansion also strips the `http+graft` / `http+g` (and https)
    * disambiguation schemes to their plain-HTTP targets (reference
    * #2262: `http+icechunk`-style URLs failed to resolve), so container
    * matching, set-time validation, and executor fetch all see the same
    * canonical `http(s)://` form.
    */
  def expandLocation(location0: String): String = {
    val location = ByteFetch.normalizeScheme(location0)
    if (!location.startsWith("vcc://")) location
    else {
      val rest = location.stripPrefix("vcc://")
      val (cname, rel) = rest.span(_ != '/')
      containers.find(_.name == cname) match {
        case Some(c) =>
          c.urlPrefix.stripSuffix("/") + "/" + rel.stripPrefix("/")
        case None => throw new graft.repo.GraftException(
          s"no virtual chunk container named '$cname' for $location")
      }
    }
  }

  /** A matched container authorizes `location` when it carries
    * credentials (a store) or an explicit no-credential sentinel that
    * covers the location's scheme (#2194). Returns the refusal message,
    * None when authorized.
    */
  private def refusal(c: VirtualChunkContainer,
                      location: String): Option[String] =
    if (c.store.isDefined) None
    else c.access match {
      case Some(a) if a.covers(location) => None
      case Some(a) => Some(
        s"virtual chunk container ${c.displayName} sentinel $a does not " +
          s"cover $location")
      case None => Some(
        s"virtual chunk container ${c.displayName} has no credentials " +
          "and no explicit no-credential sentinel (AnonymousAccess / " +
          "LocalFileSystemAccess / HttpAccess) — authorize it explicitly")
    }

  /** Why this resolver cannot fetch `location` (no container, or a
    * matched container with neither credentials nor a sentinel) — None
    * when authorized. The non-throwing form fsck's coverage check uses.
    */
  def coverageProblem(location: String): Option[String] = {
    val expanded = expandLocation(location)
    matchingContainer(expanded) match {
      case None =>
        Some(s"no virtual chunk container registered for $expanded")
      case Some(c) => refusal(c, expanded)
    }
  }

  def validateLocation(location: String): Unit =
    coverageProblem(location).foreach(msg =>
      throw new graft.repo.GraftException(msg))

  /** The store key a location resolves to inside a container's store:
    * the path after the bucket (minus the conf's key prefix) for S3, the
    * root-relative path for local stores. Fails loudly on a
    * bucket/prefix mismatch rather than fetching someone else's object.
    */
  private def storeKey(conf: StoreConf, location: String): String =
    conf match {
      case s: S3StoreConf =>
        val rest = location.stripPrefix("s3://")
        val slash = rest.indexOf('/')
        val (bucket, path) =
          if (slash < 0) (rest, "") else (rest.take(slash), rest.drop(slash + 1))
        if (!location.startsWith("s3://") || bucket != s.bucket)
          throw new graft.repo.GraftException(
            s"container store bucket '${s.bucket}' does not cover $location")
        val p = s.prefix.stripSuffix("/")
        if (p.isEmpty) path
        else if (path.startsWith(p + "/")) path.drop(p.length + 1)
        else throw new graft.repo.GraftException(
          s"$location is outside the container store prefix '$p'")
      case g: GcsStoreConf =>
        if (!location.startsWith("gs://") && !location.startsWith("gcs://"))
          throw new graft.repo.GraftException(
            s"GCS container store cannot cover $location")
        val rest = location.stripPrefix("gcs://").stripPrefix("gs://")
        val slash = rest.indexOf('/')
        val (bucket, path) =
          if (slash < 0) (rest, "") else (rest.take(slash), rest.drop(slash + 1))
        if (bucket != g.bucket)
          throw new graft.repo.GraftException(
            s"container store bucket '${g.bucket}' does not cover $location")
        stripConfPrefix(g.prefix, path, location)
      case a: AzureStoreConf =>
        if (!location.startsWith("az://"))
          throw new graft.repo.GraftException(
            s"Azure container store cannot cover $location")
        val rest = location.stripPrefix("az://")
        val parts = rest.split("/", 3)
        if (parts.length < 3 || parts(0) != a.account ||
            parts(1) != a.container)
          throw new graft.repo.GraftException(
            s"container store ${a.account}/${a.container} does not cover " +
              location)
        stripConfPrefix(a.prefix, parts(2), location)
      case l: LocalStoreConf =>
        val root = java.nio.file.Paths.get(l.root).toAbsolutePath
        root.relativize(java.nio.file.Paths.get(java.net.URI.create(location))
          .toAbsolutePath).toString.replace('\\', '/')
      case h: HttpStoreConf =>
        // http(s):// locations under the endpoint; key = relative path.
        // Per-container headers (#2143) ride on the conf itself.
        val ep = h.endpoint.stripSuffix("/") + "/"
        if (!location.startsWith(ep))
          throw new graft.repo.GraftException(
            s"HTTP container store endpoint '${h.endpoint}' does not " +
              s"cover $location")
        location.drop(ep.length)
    }

  private def stripConfPrefix(prefix: String, path: String,
                              location: String): String = {
    val p = prefix.stripSuffix("/")
    if (p.isEmpty) path
    else if (path.startsWith(p + "/")) path.drop(p.length + 1)
    else throw new graft.repo.GraftException(
      s"$location is outside the container store prefix '$p'")
  }

  /** Ranged fetch with per-container store dispatch — the executor-side
    * hot path (shipped inside Spark closures, hence Serializable). Refs
    * were scheme-validated at set-time; the only check here is the
    * no-credential guard (#2194): a matched container with neither a
    * store nor a sentinel refuses rather than silently fetching
    * anonymously (refs set before the container lost its credentials
    * must not quietly change auth).
    */
  def ranged(location0: String, offset: Long, length: Long): Array[Byte] = {
    val location = expandLocation(location0)
    matchingContainer(location) match {
      case Some(c) if c.store.isDefined =>
        val sc = c.store.get
        StoreConf.cached(sc).getRangeSplit(storeKey(sc, location), offset,
          length)
      case Some(c) =>
        refusal(c, location).foreach(msg =>
          throw new graft.repo.GraftException(msg))
        ByteFetch.ranged(location, offset, length)
      case None => throw new graft.repo.GraftException(
        s"no virtual chunk container registered for $location — readers " +
          "authorize virtual access per container (credentials or an " +
          "explicit no-credential sentinel), never by falling back to " +
          "anonymous scheme dispatch")
    }
  }

  /** Fetch bytes for a virtual ref, validating freshness checksums
    * (manifest.rs:436-443; enforcement virtual_chunks.rs:500+) — etag
    * and last-modified via a store HEAD for container-store locations,
    * filesystem mtime for `file:` ones. Ranged per-scheme dispatch — a
    * partial ref never fetches the whole external object.
    */
  def fetch(location0: String, offset: Long, length: Long,
            etag: String, lastModifiedSecs: Int): Array[Byte] = {
    validateLocation(location0)
    val location = expandLocation(location0)
    val cstore = matchingContainer(location).flatMap(_.store)
    cstore match {
      case Some(sc) if (etag != null && etag.nonEmpty) || lastModifiedSecs > 0 =>
        val st = StoreConf.cached(sc).stat(storeKey(sc, location))
          .getOrElse(throw new graft.repo.GraftException(
            s"virtual chunk at $location no longer exists"))
        if (etag != null && etag.nonEmpty && st.etag.nonEmpty &&
            st.etag != etag)
          throw new graft.repo.GraftException(
            s"virtual chunk at $location changed: etag ${st.etag} != recorded $etag")
        if (lastModifiedSecs > 0 && st.mtimeMillis / 1000 > lastModifiedSecs)
          throw new graft.repo.GraftException(
            s"virtual chunk at $location modified after recorded checksum")
      case None if lastModifiedSecs > 0 && location.startsWith("file:") =>
        val actual = ByteFetch.lastModifiedSecs(location)
        if (actual > lastModifiedSecs.toLong)
          throw new graft.repo.GraftException(
            s"virtual chunk at $location modified after recorded checksum")
      case _ => ()
    }
    ranged(location, offset, length)
  }
}

object VirtualChunkResolver {
  /** Default: any `file:` location is authorized via the explicit
    * [[LocalFileSystemAccess]] sentinel (tests register tighter
    * containers explicitly).
    */
  val default: VirtualChunkResolver =
    new VirtualChunkResolver(Seq(VirtualChunkContainer("file:",
      access = Some(LocalFileSystemAccess))))

  /** Sentinel appropriate to a prefix's scheme — what the convenience
    * constructors attach so that CALLING them is the explicit
    * anonymous-access opt-in.
    */
  def accessForScheme(prefix: String): VirtualAccess =
    if (prefix.startsWith("file:")) LocalFileSystemAccess
    else if (prefix.startsWith("http://") || prefix.startsWith("https://"))
      HttpAccess
    else AnonymousAccess

  /** Convenience: each prefix is registered with the scheme-appropriate
    * no-credential sentinel — calling this IS the anonymous opt-in.
    * Containers needing credentials use [[VirtualChunkContainer]] with a
    * [[StoreConf]] directly.
    */
  def apply(prefixes: String*): VirtualChunkResolver =
    new VirtualChunkResolver(prefixes.map(p =>
      VirtualChunkContainer(p, access = Some(accessForScheme(p)))))

  /** Containers from connector options, so `spark.read.format("graft…")`
    * reaches credentialed virtual refs without the library API:
    *
    * {{{
    * virtual.<name>.prefix        = s3://ext-bucket/data/   (registers <name>)
    * virtual.<name>.s3.endpoint   = https://…               (optional store)
    * virtual.<name>.s3.bucket     = ext-bucket
    * virtual.<name>.s3.{region,prefix,access-key,secret-key}
    * virtual.<name>.gcs.{endpoint,bucket,prefix,token}      (GCS store)
    * virtual.<name>.azure.{endpoint,account,container,prefix,sas}
    * virtual.<name>.http.endpoint                           (HTTP store)
    * virtual.<name>.http.header.<Name>    (per-request headers, #2143)
    * virtual.<name>.access = anonymous|local|http   (no-credential
    *   sentinel, #2194 — REQUIRED when no store options are given; a
    *   prefix with neither is registered but refused by name at
    *   set-time and fetch-time)
    * }}}
    *
    * The `file:` catch-all of [[default]] stays registered alongside
    * (with its [[LocalFileSystemAccess]] sentinel).
    */
  def fromOptions(opts: Map[String, String]): VirtualChunkResolver = {
    val names = opts.keys.collect {
      case k if k.startsWith("virtual.") && k.endsWith(".prefix") &&
        !k.contains(".s3.") && !k.contains(".gcs.") &&
        !k.contains(".azure.") && !k.contains(".http.") =>
        k.stripPrefix("virtual.").stripSuffix(".prefix")
    }.toSeq.sorted
    if (names.isEmpty) default
    else new VirtualChunkResolver(names.map { n =>
      def s3opt(f: String) = opts.get(s"virtual.$n.s3.$f")
      def gcsOpt(f: String) = opts.get(s"virtual.$n.gcs.$f")
      def azOpt(f: String) = opts.get(s"virtual.$n.azure.$f")
      // virtual.<n>.<backend>.header.<Name> → per-request headers
      // (#2246/#2143) on the container's store client
      def hdrs(backend: String): Map[String, String] = opts.collect {
        case (k, v) if k.startsWith(s"virtual.$n.$backend.header.") =>
          k.stripPrefix(s"virtual.$n.$backend.header.") -> v
      }
      val store: Option[StoreConf] = s3opt("endpoint").map { ep =>
        S3StoreConf(ep,
          s3opt("region").getOrElse("us-east-1"),
          s3opt("bucket").getOrElse(throw new graft.repo.GraftException(
            s"virtual container '$n': s3.bucket required with s3.endpoint")),
          s3opt("prefix").getOrElse(""),
          s3opt("access-key").getOrElse(""),
          s3opt("secret-key").getOrElse(""),
          headers = hdrs("s3")): StoreConf
      }.orElse(gcsOpt("bucket").map { bucket =>
        GcsStoreConf(
          gcsOpt("endpoint").getOrElse("https://storage.googleapis.com"),
          bucket,
          gcsOpt("prefix").getOrElse(""),
          gcsOpt("token").getOrElse(""),
          headers = hdrs("gcs")): StoreConf
      }).orElse(azOpt("container").map { container =>
        val account = azOpt("account").getOrElse(
          throw new graft.repo.GraftException(
            s"virtual container '$n': azure.account required"))
        AzureStoreConf(
          azOpt("endpoint").getOrElse(
            s"https://$account.blob.core.windows.net"),
          account, container,
          azOpt("prefix").getOrElse(""),
          azOpt("sas").getOrElse(""),
          headers = hdrs("azure")): StoreConf
      }).orElse(opts.get(s"virtual.$n.http.endpoint").map { ep =>
        HttpStoreConf(ep, hdrs("http")): StoreConf
      })
      val access: Option[VirtualAccess] =
        if (store.isDefined) None
        else opts.get(s"virtual.$n.access").map {
          case "anonymous" => AnonymousAccess
          case "local" => LocalFileSystemAccess
          case "http" => HttpAccess
          case other => throw new graft.repo.GraftException(
            s"virtual container '$n': unknown access sentinel '$other' " +
              "(anonymous|local|http)")
        }
      VirtualChunkContainer(opts(s"virtual.$n.prefix"), n, store, access)
    } :+ VirtualChunkContainer("file:",
      access = Some(LocalFileSystemAccess)))
  }
}
