"""End-to-end load pipelines (SURVEY.md §3): clinical, HDD/omics,
study operations."""
