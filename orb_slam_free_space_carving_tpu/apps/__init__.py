"""CLI drivers mirroring the reference Examples/ binaries (SURVEY.md L6)."""
