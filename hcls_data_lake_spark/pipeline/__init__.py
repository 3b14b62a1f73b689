"""The reference's dataflow (SURVEY.md §2.A) as DataFrame transforms."""
