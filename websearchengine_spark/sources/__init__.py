"""Sources: deterministic corpus fixture synthesis + readers for the
reference's input formats (corpus TSV, view log, ads TSV)."""
