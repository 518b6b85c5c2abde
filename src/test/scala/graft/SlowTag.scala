package graft

import org.scalatest.Tag

/** Tag for the multi-second lifecycle/streaming tests (index
  * build+append+compact round trips, micro-batch ingest loops) — the
  * ~20 tests that were ~220 s of the suite's ~6 min wall.
  *
  * The default `sbt test` EXCLUDES them (`-l graft.Slow` in
  * build.sbt) so the edit-test loop stays under ~3 minutes; a full
  * CI-style run executes everything via `GRAFT_FULL_TESTS=1 sbt test`
  * (documented in README). The tag changes scheduling only — every
  * tagged test stays green and is part of the full gate.
  */
object Slow extends Tag("graft.Slow")
