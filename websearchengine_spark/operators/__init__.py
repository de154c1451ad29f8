"""Operator layer: index build, statistics, query evaluation, ranking,
mining, evaluation, dedup/similarity/text-analysis — every operator from
SURVEY.md §2, expressed as DataFrame transformations."""
