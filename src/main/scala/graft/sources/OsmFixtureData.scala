package graft.sources

import java.nio.file.{Files, Path}

/** Reconstruction of the reference's missing `example.osm` golden
  * fixture (FIXTURES.md §1) — main-scope so both the ScalaTest suites
  * and the driver-checkable S-operator queries (graft.queries
  * .OsmQueries) ingest the same deterministic corpus.
  *
  * The reference's asserts are mutually inconsistent on a single file
  * (Lesson6Quizes/mapparser.py pins nd=4 while data.py's golden way has
  * 7 nd refs; tags.py pins lower_colon=0 while audit.py needs
  * `addr:street` keys), so the original example.osm evidently differed
  * between quizzes. We ship three fixtures, each pinning one contract
  * exactly:
  *
  *  - [[xml]]     — histogram {osm:1, bounds:1, node:20, way:1,
  *                  relation:1, nd:4, member:3, tag:7}
  *                  (Lesson6Quizes/mapparser.py:28-35); 6 distinct users
  *                  (users.py:26-30); 3 unexpected street types incl.
  *                  "West Lexington St." and "Baldwin Rd."
  *                  (audit.py:67-79)
  *  - [[tagsXml]] — key classes {lower:5, lower_colon:0, other:1,
  *                  problemchars:1} (tags.py:50-55)
  *  - [[dataXml]] — the shape_element golden rows (data.py:183-210):
  *                  first = node 261114295, last = the way with the
  *                  7-ref closed node_refs ring, order preserved
  */
object OsmFixtureData {

  // 20 nodes / 1 way / 1 relation / 1 bounds; 4 nd; 3 member; 7 tag.
  // Distinct users (6): bbmiller, uboot, Umbugbene, Zol87, mpinnau, TomH.
  // addr:street values (3 unexpected types): "West Lexington St." (St.),
  // "Baldwin Rd." (Rd.), "North Mozart Ave" (Ave).
  // Tags (7): way[addr:street, addr:housenumber], nodeA[addr:street],
  // nodeB[addr:street], + amenity, name, place.
  val xml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osm version="0.6" generator="graft-fixture">
      | <bounds minlat="41.9700" minlon="-87.6900" maxlat="41.9800" maxlon="-87.6800"/>
      | <node id="261114295" visible="true" version="7" changeset="11129782" timestamp="2012-03-28T18:31:23Z" user="bbmiller" uid="451048" lat="41.9730791" lon="-87.6866303"/>
      | <node id="261114296" visible="true" version="6" changeset="8448766" timestamp="2011-06-15T17:04:54Z" user="bbmiller" uid="451048" lat="41.9730416" lon="-87.6878512"/>
      | <node id="261114299" visible="true" version="5" changeset="8581395" timestamp="2011-06-29T14:14:14Z" user="bbmiller" uid="451048" lat="41.9729565" lon="-87.6939548"/>
      | <node id="261146436" visible="true" version="7" changeset="8448766" timestamp="2011-06-15T17:04:54Z" user="bbmiller" uid="451048" lat="41.970738" lon="-87.6976025"/>
      | <node id="261147304" visible="true" version="7" changeset="8448766" timestamp="2011-06-15T17:04:54Z" user="bbmiller" uid="451048" lat="41.9740068" lon="-87.6988576"/>
      | <node id="261224274" visible="true" version="4" changeset="5288876" timestamp="2010-07-22T16:16:51Z" user="uboot" uid="26299" lat="41.9707217" lon="-87.6976912"/>
      | <node id="293816175" visible="true" version="47" changeset="8448766" timestamp="2011-06-15T16:55:37Z" user="bbmiller" uid="451048" lat="41.9730154" lon="-87.6890403"/>
      | <node id="305896090" visible="true" version="37" changeset="15348240" timestamp="2013-03-13T07:46:29Z" user="Umbugbene" uid="567034" lat="41.9749225" lon="-87.6891198"/>
      | <node id="317636974" visible="true" version="12" changeset="15348240" timestamp="2013-03-13T08:02:56Z" user="Umbugbene" uid="567034" lat="41.9740292" lon="-87.701243"/>
      | <node id="317636971" visible="true" version="13" changeset="15348240" timestamp="2013-03-13T08:08:01Z" user="Umbugbene" uid="567034" lat="41.9748113" lon="-87.6847998"/>
      | <node id="317637399" visible="true" version="2" changeset="14927972" timestamp="2013-02-05T22:43:49Z" user="Zol87" uid="447979" lat="41.9758794" lon="-87.6923639">
      |  <tag k="amenity" v="restaurant"/>
      | </node>
      | <node id="317637398" visible="true" version="2" changeset="14927972" timestamp="2013-02-05T22:43:49Z" user="Zol87" uid="447979" lat="41.9757030" lon="-87.6921867">
      |  <tag k="name" v="La Cabana De Don Luis"/>
      | </node>
      | <node id="365214872" visible="true" version="3" changeset="8448766" timestamp="2011-06-15T17:04:54Z" user="bbmiller" uid="451048" lat="41.973113" lon="-87.6847029"/>
      | <node id="1683602133" visible="true" version="1" changeset="10116202" timestamp="2011-12-15T15:51:13Z" user="mpinnau" uid="546912" lat="41.9747374" lon="-87.6920102">
      |  <tag k="addr:street" v="Baldwin Rd."/>
      | </node>
      | <node id="1683602134" visible="true" version="1" changeset="10116202" timestamp="2011-12-15T15:51:13Z" user="mpinnau" uid="546912" lat="41.9747474" lon="-87.6920202">
      |  <tag k="addr:street" v="North Mozart Ave"/>
      | </node>
      | <node id="2199822281" visible="true" version="1" changeset="15348240" timestamp="2013-03-13T08:02:00Z" user="Umbugbene" uid="567034" lat="41.9707220" lon="-87.6976913"/>
      | <node id="2199822390" visible="true" version="1" changeset="15348240" timestamp="2013-03-13T08:02:00Z" user="Umbugbene" uid="567034" lat="41.9707230" lon="-87.6976914"/>
      | <node id="2199822392" visible="true" version="1" changeset="15348240" timestamp="2013-03-13T08:02:00Z" user="Umbugbene" uid="567034" lat="41.9707240" lon="-87.6976915"/>
      | <node id="2199822369" visible="true" version="1" changeset="7781188" timestamp="2011-04-06T05:17:15Z" user="TomH" uid="5061" lat="41.9707250" lon="-87.6976916">
      |  <tag k="place" v="city"/>
      | </node>
      | <node id="2199822370" visible="true" version="1" changeset="7781188" timestamp="2011-04-06T05:17:15Z" user="TomH" uid="5061" lat="41.9707260" lon="-87.6976917"/>
      | <way id="209809850" visible="true" version="1" changeset="15353317" timestamp="2013-03-13T15:58:04Z" user="Umbugbene" uid="674454">
      |  <nd ref="2199822281"/>
      |  <nd ref="2199822390"/>
      |  <nd ref="2199822392"/>
      |  <nd ref="2199822369"/>
      |  <tag k="addr:street" v="West Lexington St."/>
      |  <tag k="addr:housenumber" v="1412"/>
      | </way>
      | <relation id="2634203" visible="true" version="1" changeset="15348240" timestamp="2013-03-13T08:02:00Z" user="Umbugbene" uid="567034">
      |  <member type="way" ref="209809850" role="outer"/>
      |  <member type="node" ref="261114295" role=""/>
      |  <member type="node" ref="261114296" role=""/>
      | </relation>
      |</osm>
      |""".stripMargin

  // 7 tags: 5 lower (amenity, cuisine, name, place, highway),
  // 1 other (PHONE — uppercase), 1 problemchars (addr.street — the '.').
  val tagsXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osm version="0.6" generator="graft-fixture">
      | <node id="1" lat="41.0" lon="-87.0" user="a" uid="1" version="1" changeset="1" timestamp="2013-01-01T00:00:00Z">
      |  <tag k="amenity" v="restaurant"/>
      |  <tag k="cuisine" v="mexican"/>
      |  <tag k="name" v="La Cabana De Don Luis"/>
      |  <tag k="PHONE" v="1 (773)-271-5176"/>
      | </node>
      | <node id="2" lat="41.1" lon="-87.1" user="b" uid="2" version="1" changeset="2" timestamp="2013-01-02T00:00:00Z">
      |  <tag k="place" v="city"/>
      |  <tag k="highway" v="motorway_junction"/>
      |  <tag k="addr.street" v="Problem Chars Rd"/>
      | </node>
      |</osm>
      |""".stripMargin

  // Golden shaping rows (data.py:183-210): first element is node
  // 261114295 with the exact golden pos/created; last element is the
  // way whose node_refs ring is [...2199822284, 2199822281] — first ==
  // last ref, document order preserved. A relation sits between them to
  // pin the drop rule. Includes the data.py docstring's addr:street:*
  // second-colon drops.
  val dataXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osm version="0.6" generator="graft-fixture">
      | <node id="261114295" visible="true" version="7" changeset="11129782" timestamp="2012-03-28T18:31:23Z" user="bbmiller" uid="451048" lat="41.9730791" lon="-87.6866303"/>
      | <relation id="2634203" visible="true" version="1" changeset="15348240" timestamp="2013-03-13T08:02:00Z" user="Umbugbene" uid="567034">
      |  <member type="way" ref="209809850" role="outer"/>
      | </relation>
      | <way id="209809850" visible="true" version="1" changeset="15353317" timestamp="2013-03-13T15:58:04Z" user="chicago-buildings" uid="674454">
      |  <nd ref="2199822281"/>
      |  <nd ref="2199822390"/>
      |  <nd ref="2199822392"/>
      |  <nd ref="2199822369"/>
      |  <nd ref="2199822370"/>
      |  <nd ref="2199822284"/>
      |  <nd ref="2199822281"/>
      |  <tag k="addr:street" v="West Lexington St."/>
      |  <tag k="addr:street:name" v="Lexington"/>
      |  <tag k="addr:street:prefix" v="West"/>
      |  <tag k="addr:housenumber" v="1412"/>
      |  <tag k="building" v="yes"/>
      | </way>
      |</osm>
      |""".stripMargin

  /** Write a fixture file under `dir`; returns the file path. */
  def write(dir: Path, name: String, content: String): Path = {
    val d = Files.createDirectories(dir)
    val p = d.resolve(name)
    Files.writeString(p, content)
    p
  }
}
