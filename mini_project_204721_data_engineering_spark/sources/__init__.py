"""Raw-source connectors (SURVEY §2.1).

The reference ingests NetCDF rainfall grids, an ESRI shapefile, a TIS-620
DBF table and Excel workbooks (S1-S5).  Here each source is split into

- a thin *read* layer (driver-side; import-gated where the format needs a
  library this environment lacks — NetCDF, xlsx), and
- the *Spark-side* logic (longitude wrap, bbox filter, grid flattening,
  sheet-layout normalization, spatial join) — pure DataFrame/pandas code,
  fully implemented and tested regardless of which readers are available.

DBF and ESRI .shp get dependency-free pure-Python readers (both are
small fixed public binary formats), so the dims/risk pipelines are
testable end-to-end from the real binary inputs — no geopandas/dbfread
needed.
"""
