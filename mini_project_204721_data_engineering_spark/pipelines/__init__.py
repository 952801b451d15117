"""The reference's three ingest pipelines + dims init, Spark-first
(SURVEY §3 / §7 Phase 3).

Each pipeline is a lazy DataFrame dataflow — the reference's eager
pandas steps become stages of one Catalyst plan, with the same
aggregate-before-join ordering it hand-optimizes (SURVEY §4.1):

- :mod:`.dims` — shapefile-shaped polygons → province/district dims
- :mod:`.rain` — rainfall grid → spatial join → per-district daily facts
- :mod:`.risk` — DBF risk table → class mean → level, with missing-
  district fill
- :mod:`.incidents` — incident log → per-day counts with idempotent
  anti-join append
"""
