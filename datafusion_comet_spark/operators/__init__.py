"""Custom operators beyond the built-in DataFrame surface.

Anything the reference (or the 100 TB pipeline mandate) needs that
Spark lacks as a built-in lands here, in preference order: composition
of DataFrame ops → Arrow-batched pandas UDF / mapInPandas →
mapPartitions (last resort).  See SURVEY.md §7.3.
"""
