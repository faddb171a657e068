"""EXT operator library: composable timeseries / dedup / similarity /
text-analysis operators the reference lacks (SURVEY.md §2 ABSENT rows).

Each operator is a pure function DataFrame -> DataFrame, built from
declarative Spark ops so Catalyst keeps optimizing through them.
"""
