package graft.virt

/** Virtual chunk containers: registered external URL prefixes whose files
  * hold chunk bytes (virtual_chunks.rs:96-110). Locations are matched to a
  * container by longest-prefix (`matching_container`,
  * virtual_chunks.rs:383-458); unauthorized locations are rejected at
  * set-time (session.rs:631-655).
  */
final case class VirtualChunkContainer(urlPrefix: String,
                                       name: String = "")

final class VirtualChunkResolver(val containers: Seq[VirtualChunkContainer]) {
  /** name → prefix map, serializable for executor-side expansion. */
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
  def expandLocation(location: String): String =
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

  def validateLocation(location: String): Unit = {
    val expanded = expandLocation(location)
    if (matchingContainer(expanded).isEmpty)
      throw new graft.repo.GraftException(
        s"no virtual chunk container registered for $expanded")
  }

  /** Fetch bytes for a virtual ref, validating freshness checksums
    * (manifest.rs:436-443; enforcement virtual_chunks.rs:500+). Ranged
    * per-scheme dispatch via [[ByteFetch]] — a partial ref never fetches
    * the whole external object.
    */
  def fetch(location0: String, offset: Long, length: Long,
            etag: String, lastModifiedSecs: Int): Array[Byte] = {
    validateLocation(location0)
    val location = expandLocation(location0)
    if (lastModifiedSecs > 0 && location.startsWith("file:")) {
      val actual = ByteFetch.lastModifiedSecs(location)
      if (actual > lastModifiedSecs.toLong)
        throw new graft.repo.GraftException(
          s"virtual chunk at $location modified after recorded checksum")
    }
    ByteFetch.ranged(location, offset, length)
  }
}

object VirtualChunkResolver {
  /** Default: any `file:` location is authorized (tests register tighter
    * containers explicitly).
    */
  val default: VirtualChunkResolver =
    new VirtualChunkResolver(Seq(VirtualChunkContainer("file:")))

  def apply(prefixes: String*): VirtualChunkResolver =
    new VirtualChunkResolver(prefixes.map(VirtualChunkContainer(_)))
}
