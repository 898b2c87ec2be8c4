"""LogsQL-style relational surface (SURVEY.md §2.9): the 57 pipe /
26 stats-function / 34 filter operator families of the vendored
VictoriaLogs engine, re-expressed as DataFrame combinators."""
