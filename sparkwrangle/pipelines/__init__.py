"""End-to-end pipelines re-expressing the reference's two entry points
(SURVEY.md §3 EP1/EP2) as Catalyst plans feeding the stateful operators."""
