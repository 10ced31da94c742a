package graft.sources

import graft.streaming.{IngestSource, SyntheticOpenSkySource}

/** Name → source registry (SURVEY §2A A14): the Scala replacement for the
  * reference's `.so` dlopen registry (registry.go:10-55). Traits + a map
  * give the same extension point without dynamic loading; registration is
  * explicit (or could be ServiceLoader-driven) and lookup failures are
  * loud, matching registry_test.go's unknown-name contract.
  */
object SourceRegistry {

  private val builders = scala.collection.concurrent.TrieMap[String, Map[String, String] => IngestSource](
    "opensky" -> (opts =>
      opts.get("url") match {
        case Some(url) =>
          new OpenSkyHttpSource(url, opts.getOrElse("user", ""), opts.getOrElse("password", ""))
        case None =>
          new SyntheticOpenSkySource(opts.getOrElse("statesPerTick", "100").toInt)
      }))

  /** Register a source builder (plugin's Register(name, p) analogue). */
  def register(name: String, builder: Map[String, String] => IngestSource): Unit =
    builders.put(name, builder)

  /** Remove a registered builder (tests / dynamic reconfiguration). */
  def deregister(name: String): Unit = builders.remove(name)

  /** Resolve by config name; unknown names fail fast (InitPlugin parity:
    * registry.go:16-22 errors on unregistered names). */
  def resolve(name: String, opts: Map[String, String] = Map.empty): IngestSource =
    builders.get(name) match {
      case Some(b) => b(opts)
      case None => throw new IllegalArgumentException(
        s"unknown ingest source '$name'; registered: ${builders.keys.toSeq.sorted.mkString(", ")}")
    }

  def names: Seq[String] = builders.keys.toSeq.sorted
}
