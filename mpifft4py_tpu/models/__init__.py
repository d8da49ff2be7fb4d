"""Consumer models: pseudo-spectral DNS solvers built on the transform classes
(the spectralDNS usage pattern — SURVEY.md §3.5)."""
