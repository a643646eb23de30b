package graft

/** Shared 12-row wide media NDJSON fixture (see [[graft.app.DemoData]]
  * — the CLI's zero-input demo data is the same fixture). Used by
  * MediaPipelineSpec (pipeline semantics) and EtlModulesSpec (JDBC
  * round-trip of the split tables).
  */
object MediaFixture {
  lazy val path: String = graft.app.DemoData.writeWideNdjson()
}
