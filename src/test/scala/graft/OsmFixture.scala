package graft

import java.nio.file.{Files, Path}

/** Test-scope veneer over [[graft.sources.OsmFixtureData]] (the
  * reconstructed `example.osm` golden fixtures — see that object's
  * scaladoc for the contract each variant pins). */
object OsmFixture {
  val xml: String = sources.OsmFixtureData.xml
  val tagsXml: String = sources.OsmFixtureData.tagsXml
  val dataXml: String = sources.OsmFixtureData.dataXml

  /** Write a fixture under the build's target dir; returns the path.
    * `name` may contain subdirectories (created as needed). */
  def write(name: String, content: String): Path = {
    val p = Path.of("target", "fixtures").resolve(name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p
  }
}
