"""File readers (SURVEY.md §2.1): comment-aware TSV, mapping files,
GPL platforms, VCF, PLINK.
"""
