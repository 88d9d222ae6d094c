"""tmdataloader_spark — a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of the tranSMART ETL reference
(Clarivate-LSPS/tMDataLoader), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle sizing, Arrow)
- ``functions``  : scalar expression library (path ops, value coercion,
                   timepoints, metadata XML) — SURVEY.md §2.8
- ``operators``  : relational operators (cleansing, melt/pivot, type
                   inference, dedup/validation, tree/ontology, z-score,
                   merge modes) — SURVEY.md §2.2–2.10
- ``sources``    : file readers (comment-aware TSV, mapping files, GPL,
                   VCF, PLINK) — SURVEY.md §2.1
- ``plans``      : end-to-end pipelines (clinical load, HDD/omics load,
                   study operations) — SURVEY.md §3
- ``statistic``  : summary statistics + validation rules — §2.5 A11/A12
- ``llmdata``    : large-scale training-data operators (dedup families,
                   similarity search, text analysis, multimodal plumbing)

Everything is DataFrame/SQL-first: logical plans are declared with the
DataFrame API and Catalyst/Tungsten pick the physical strategy. Python
touches data only through Arrow-batched Pandas UDFs, and only where
built-in expressions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
