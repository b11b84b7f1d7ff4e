"""Dataset -> Dataset pipeline stages (SURVEY.md §4 physical plan)."""
