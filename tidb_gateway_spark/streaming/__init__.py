"""Structured Streaming jobs over the events stream (SURVEY.md §2B
Q56–Q59 streaming twins + watermark/late-data policy)."""
