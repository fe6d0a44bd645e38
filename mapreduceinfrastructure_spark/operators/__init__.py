"""Query-pattern operators (SURVEY.md §2.2) as DataFrame compositions."""
